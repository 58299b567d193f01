#!/usr/bin/env python
"""Class mapping shim re-exporting inconsistencymasks_tpu.class_mappings.

TPU-native equivalent of the reference script of the same name
(MichaelVorndran/InconsistencyMasks).  Zero-arg CLI, same outputs
(checkpoints / results CSVs / prediction PNGs under BASE_DIR).
"""
import sys, os
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inconsistencymasks_tpu.class_mappings import (
    COLOR_TO_CLASS_MAPPING_SUIM, COLOR_TO_CLASS_MAPPING_SUIM_ORG,
    CLASS_TO_COLOR_MAPPING_SUIM, SUIM_CLASS_DESCRIPTION as CLASS_DESCRIPTION)

