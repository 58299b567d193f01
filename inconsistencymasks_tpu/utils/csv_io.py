"""CSV output with the reference's conventions: ';' delimiter, header row,
one row per candidate (reference ISIC_2018/03_ISIC_2018_subset.py:96-104)."""

from __future__ import annotations

import csv
import os
from typing import Iterable, Sequence


def write_results_csv(path: str, header: Sequence[str],
                      rows: Iterable[Sequence]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8", newline="") as f:
        writer = csv.writer(f, delimiter=";")
        writer.writerow(header)
        for row in rows:
            writer.writerow(row)
