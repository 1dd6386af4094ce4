"""Host input-pipeline throughput: images/s through the threaded loader
(full load→resize→pad→flip→mini-mask preprocessing on synthetic COCO data).

The train step consumes ~14-15 img/s/chip (profile_train.py); the loader
must sustain N_chips × that on one host.

NOTE: the dev container this was authored in exposes ONE CPU core (nproc=1),
so worker scaling cannot be measured there — run this on the real TPU host
(which has dozens of cores per chip) to size DATA.LOADER_WORKER_NUM and to
pick DATA.LOADER_WORKER_MODE: MODE=process uses spawned workers (the
torch-DataLoader equivalent; spawn, not fork — fork under the live
JAX/orbax/monitor threads can deadlock the child, see data/loader.py) whose
whole __getitem__ parallelizes; threads only parallelize the GIL-releasing
decode/resize portions. Spawn re-imports the module per worker, so startup
cost is per-worker interpreter boot, not COW page sharing.
Sweep: for M in thread process; do for W in 1 2 4 8 16 32; do
MODE=$M W=$W python scripts/profile_loader.py; done; done
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import tempfile
import time

from feature_intertwiner_tpu.config import build_config
from feature_intertwiner_tpu.data import get_data, synthetic

WORKERS = int(os.environ.get("W", "8"))
IMAGES = int(os.environ.get("N", "64"))
MODE = os.environ.get("MODE", "thread")      # thread | process


def main():
    root = tempfile.mkdtemp()
    synthetic.generate(root, num_images=IMAGES, size=(800, 1100), seed=1)
    cfg = build_config()
    cfg.CTRL.QUICK_VERIFY = True   # train on minival split (the synth set)
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.DATA.LOADER_WORKER_NUM = WORKERS
    cfg.DATA.LOADER_WORKER_MODE = MODE
    cfg.finalize()
    loader, _, _ = get_data(cfg, data_root=root)

    loader.set_epoch(1)
    n = 0
    t0 = time.perf_counter()
    for batch in loader:
        n += batch["images"].shape[0]
    dt = time.perf_counter() - t0
    print(f"mode={MODE} workers={WORKERS}: {n} images in {dt:.2f}s = "
          f"{n / dt:.1f} img/s host preprocessing")


if __name__ == "__main__":
    main()
