"""Static config-key consistency: every ``cfg.<NS>.<KEY>`` attribute chain
read anywhere in the package must exist in the config tree built by
``build_config()``.

Motivation: the live monitor read ``cfg.CTRL.USE_VISDOM`` while the key
lives under ``MISC`` — with a ``getattr(..., False)`` default the feature
silently never activated. The reference has the same failure mode (its
AttrDict raises only at use time). This test catches that whole bug class
at the source level.
"""

import os
import re

from feature_intertwiner_tpu.config import build_config

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "feature_intertwiner_tpu")
EXTRA_FILES = ["main.py", "bench.py", "__graft_entry__.py"]

# keys set at runtime (not config-tree defaults) or only present when a
# feature is active — each entry must be justified
RUNTIME_KEYS = {
    ("DATA", "IMAGE_SHAPE"),     # derived in finalize()
    ("MISC", "DEVICE_ID"),       # list; indexed reads regex-match oddly
}

CHAIN = re.compile(r"\bcfg\.([A-Z][A-Z_]*)\.([A-Z][A-Z_0-9]*)\b")


def iter_chains():
    root = os.path.dirname(PKG)
    files = [os.path.join(root, f) for f in EXTRA_FILES]
    for dirpath, _, names in os.walk(PKG):
        files += [os.path.join(dirpath, n)
                  for n in names if n.endswith(".py")]
    for path in files:
        with open(path) as f:
            for lineno, line in enumerate(f, 1):
                for m in CHAIN.finditer(line.replace("self.", "")):
                    yield path, lineno, m.group(1), m.group(2)


def test_all_config_key_reads_exist():
    cfg = build_config()
    cfg.finalize()
    bad = []
    for path, lineno, ns, key in iter_chains():
        if (ns, key) in RUNTIME_KEYS:
            continue
        node = getattr(cfg, ns, None)
        if node is None:
            bad.append(f"{path}:{lineno}: cfg.{ns} (namespace missing)")
        elif key not in node:
            bad.append(f"{path}:{lineno}: cfg.{ns}.{key}")
    assert not bad, "config keys read but absent from build_config():\n" + \
        "\n".join(bad)
