"""End-to-end eval throughput: host mold -> device inference -> host unmold
-> COCO results, on one chip at full 1024 scale (64 synthetic images).

The device-only bench (bench.py) reports ~96 img/s; this measures what the
user-facing eval loop actually sustains, including the host side.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

from feature_intertwiner_tpu.config import build_config
from feature_intertwiner_tpu.data import get_data, synthetic
from feature_intertwiner_tpu.models import InterNet
from feature_intertwiner_tpu.train.workflow import test_model

root = tempfile.mkdtemp()
n_img = int(os.environ.get("N_IMG", "64"))
synthetic.generate(root, num_images=n_img, size=(768, 1024), seed=9)

cfg = build_config()
cfg.CTRL.QUICK_VERIFY = True
cfg.MODEL.BACKBONE = os.environ.get("BACKBONE", "resnet50")
cfg.TRAIN.BATCH_SIZE = int(os.environ.get("BATCH", "16"))  # eval = 2x train
cfg.DEV.SWITCH = True
cfg.DEV.LOSS_CHOICE = "l2"
cfg.DEV.UPSAMPLE_FAC = 1.0
cfg.finalize()
cfg.MISC.RESULT_FOLDER = tempfile.mkdtemp()
cfg.MISC.LOG_FILE = os.path.join(cfg.MISC.RESULT_FOLDER, "log.txt")

loader, val, val_api = get_data(cfg, data_root=root)
cfg.DATASET.NUM_CLASSES = val.num_classes

model = InterNet.from_config(cfg, dtype=jnp.bfloat16)
variables = jax.jit(lambda: model.init(
    {"params": jax.random.PRNGKey(0)},
    jnp.zeros((1, cfg.DATA.IMAGE_MAX_DIM, cfg.DATA.IMAGE_MAX_DIM, 3)),
    mode="inference",
    windows=jnp.array([[0, 0, cfg.DATA.IMAGE_MAX_DIM,
                        cfg.DATA.IMAGE_MAX_DIM]], jnp.float32)))()

t0 = time.time()
stats = test_model(model, variables, cfg, val, val_api, epoch=999)
dt = time.time() - t0
print(f"PASS1 (incl. compile+COCOeval): {dt:.1f}s for {n_img} images")

# second pass reuses the in-process jit cache: the steady-state number
# (different epoch -> fresh det cache)
t0 = time.time()
stats = test_model(model, variables, cfg, val, val_api, epoch=998)
dt = time.time() - t0
print(f"PASS2 steady state: {dt:.1f}s for {n_img} images "
      f"({dt / n_img * 1e3:.0f} ms/im)")
