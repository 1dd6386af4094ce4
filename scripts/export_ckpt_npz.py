"""Export a training checkpoint's weights as a pretrained-overlay npz.

Usage: python scripts/export_ckpt_npz.py <run_folder> <out.npz>

The npz uses the converter-CLI layout (params/<path>, batch_stats/<path> —
utils/convert_weights.py::load_converted_npz), so any run can consume it via
``MODEL.INIT_FILE_CHOICE`` as a strict=False weight overlay: same-name/shape
leaves load, everything else (e.g. a fresh intertwiner) stays initialized.
Used by the ablation's paper-regime fine-tune arm (the reference always
starts from a pretrained model, /root/reference/tools/utils.py:271-313).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import numpy as np
import orbax.checkpoint as ocp
from flax import traverse_util

from feature_intertwiner_tpu.train.checkpoint import find_last


def main():
    folder, out = sys.argv[1], sys.argv[2]
    path = find_last(folder)
    assert path, f"no checkpoint under {folder}"
    raw = ocp.PyTreeCheckpointer().restore(path)
    flat = {}
    for label in ("params", "batch_stats"):
        for k, v in traverse_util.flatten_dict(raw.get(label, {})).items():
            flat[f"{label}/" + "/".join(k)] = np.asarray(v)
    np.savez(out, **flat)
    print(f"exported {len(flat)} arrays from {path} -> {out}")


if __name__ == "__main__":
    main()
