"""Pin every pipeline wrapper's n grid to the reference script's loop.

The reference's IM-family scripts iterate ``for n in range(a, b)`` with
grids that VARY per dataset/stage (e.g. ``range(2, 5)`` = n in {2,3,4} in
ISIC_2018/09_ISIC_2018_IM.py:51 but ``range(2, 3)`` = n=2 ONLY in
HeLa/12_HeLa_IM++.py:150).  Round 2 shipped 11 wrappers with the wrong
grid; this test extracts the loop from each reference script and asserts
the same-named repo wrapper runs exactly that grid.
"""

import ast
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

DEFAULT_GRID = (2, 3, 4)  # DatasetAdapter.n_values default

# every repo script whose stage runner iterates ad.n_values
N_GRID_SCRIPTS = [
    "ISIC_2018/09_ISIC_2018_IM.py", "HeLa/09_HeLa_IM.py",
    "SUIM/10_SUIM_IM.py", "Cityscapes/09_Cityscapes_IM.py",
    "ISIC_2018/11_ISIC_2018_IM+.py", "HeLa/11_HeLa_IM+.py",
    "SUIM/12_SUIM_IM+.py", "Cityscapes/11_Cityscapes_IM+.py",
    "ISIC_2018/12_ISIC_2018_IM++.py", "HeLa/12_HeLa_IM++.py",
    "SUIM/13_SUIM_IM++.py", "Cityscapes/12_Cityscapes_IM++.py",
    "ISIC_2018/13_ISIC_2018_aug_IM+.py", "HeLa/13_HeLa_aug_IM+.py",
    "SUIM/14_SUIM_aug_IM+.py", "Cityscapes/13_Cityscapes_aug_IM+.py",
    "ISIC_2018/14_ISIC_2018_aug_IM++.py", "HeLa/14_HeLa_aug_IM++.py",
    "SUIM/15_SUIM_aug_IBAs++.py", "Cityscapes/14_Cityscapes_aug_IM++.py",
    "SUIM/16_SUIM_GT_IM++.py",
]


def reference_n_grid(rel):
    with open(os.path.join(REF, rel)) as f:
        src = f.read()
    loops = re.findall(r"for n in range\((\d+)\s*,\s*(\d+)\)", src)
    assert loops, f"reference {rel} has no `for n in range(a,b)` loop"
    grids = {tuple(range(int(a), int(b))) for a, b in loops}
    assert len(grids) == 1, f"reference {rel} has conflicting n grids"
    return grids.pop()


def wrapper_n_grid(rel):
    """The grid the repo wrapper actually runs: default_n_values if the
    make_adapter call passes it, else the DatasetAdapter default.  Also
    asserts no post-hoc ``ad.n_values = ...`` assignment exists (those
    would clobber the IM_N_VALUES scale-down knob)."""
    with open(os.path.join(REPO, rel)) as f:
        src = f.read()
    assert "ad.n_values" not in src, (
        f"{rel}: set the grid via make_adapter(default_n_values=...), not "
        "by assigning ad.n_values (that defeats IM_N_VALUES)")
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
                and node.func.id == "make_adapter"):
            for kw in node.keywords:
                if kw.arg == "default_n_values":
                    return tuple(ast.literal_eval(kw.value))
            return DEFAULT_GRID
    raise AssertionError(f"{rel}: no make_adapter call found")


@pytest.mark.parametrize("rel", N_GRID_SCRIPTS)
def test_wrapper_grid_matches_reference(rel):
    assert wrapper_n_grid(rel) == reference_n_grid(rel), rel


def test_reference_grid_table_sanity():
    """The extracted table itself: ISIC runs the full grid everywhere
    except aug_IM++; the aug_IM++/GT_IM++ family is n=2 only everywhere."""
    assert reference_n_grid("ISIC_2018/09_ISIC_2018_IM.py") == (2, 3, 4)
    assert reference_n_grid("ISIC_2018/12_ISIC_2018_IM++.py") == (2, 3, 4)
    assert reference_n_grid("ISIC_2018/14_ISIC_2018_aug_IM++.py") == (2,)
    assert reference_n_grid("HeLa/11_HeLa_IM+.py") == (2,)
    assert reference_n_grid("SUIM/16_SUIM_GT_IM++.py") == (2,)
