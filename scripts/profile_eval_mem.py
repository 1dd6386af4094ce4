"""Eval-step HBM audit: where does inference memory go, and is batch 32 the knee?

VERDICT r1 #9: batch 64 inference OOMs on the 16 GB chip; either reach it
(activation-dtype audit + donation) or document why batch 32 is the knee.
This script AOT-compiles the full inference step (model.apply mode=
'inference', the exact program bench.py times) at several batch sizes and
prints XLA's memory_analysis() — exact HBM for arguments / outputs /
temporaries / generated code — without executing, then (optionally, RUN=1)
executes the largest batch that the analysis says fits.

Usage: python scripts/profile_eval_mem.py   [B_LIST=8,16,32,48,64] [RUN=1]
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E401,E702

import time

import jax
import jax.numpy as jnp
import numpy as np

from feature_intertwiner_tpu.models import InterNet

SIZE = int(os.environ.get("S", "1024"))
B_LIST = [int(b) for b in os.environ.get("B_LIST", "8,16,32,48,64").split(",")]
HBM_BYTES = 16 * 1024**3  # v5e
# fraction of HBM the analysis may plan before we call it an OOM risk;
# FIT_FRAC=1.0 turns RUN=1 into an actual OOM probe (check_max_mem-style)
FIT_FRAC = float(os.environ.get("FIT_FRAC", "0.95"))


def build(batch, donate):
    model = InterNet(backbone="resnet50", num_classes=81, image_size=SIZE,
                     dev_switch=True, dev_loss_choice="l2",
                     dev_upsample_fac=1.0, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    images = jnp.array(rng.randn(batch, SIZE, SIZE, 3).astype(np.float32))
    windows = jnp.tile(jnp.array([[0.0, 0.0, SIZE, SIZE]], jnp.float32),
                       (batch, 1))
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, images,
                           mode="inference", windows=windows))()

    def infer(v, im, win):
        return model.apply(v, im, mode="inference", windows=win)

    kw = {"donate_argnums": (1,)} if donate else {}
    compiled = (jax.jit(infer, **kw)
                .lower(variables, images, windows).compile())
    return compiled, variables, images, windows


def report(batch, donate):
    try:
        compiled, v, im, win = build(batch, donate)
    except Exception as e:  # compile-time OOM shows up here
        print(f"B={batch:3d} donate={int(donate)}  COMPILE FAILED: "
              f"{str(e).splitlines()[0][:120]}")
        return None
    m = compiled.memory_analysis()
    tot = (m.argument_size_in_bytes + m.output_size_in_bytes
           + m.temp_size_in_bytes + m.generated_code_size_in_bytes)
    if donate:
        tot -= m.alias_size_in_bytes
    gb = 1024**3
    print(f"B={batch:3d} donate={int(donate)}  args {m.argument_size_in_bytes/gb:5.2f}  "
          f"out {m.output_size_in_bytes/gb:5.2f}  temp {m.temp_size_in_bytes/gb:5.2f}  "
          f"code {m.generated_code_size_in_bytes/gb:5.2f}  "
          f"alias {m.alias_size_in_bytes/gb:5.2f}  -> peak ~{tot/gb:5.2f} GB "
          f"({'fits' if tot < HBM_BYTES * FIT_FRAC else 'OOM risk'})")
    return (compiled, v, im, win, tot)


def main():
    results = {}
    for b in B_LIST:
        for donate in (False, True):
            r = report(b, donate)
            if r is not None:
                results[(b, donate)] = r
        sys.stdout.flush()

    if os.environ.get("RUN"):
        fitting = [k for k, r in results.items() if r[4] < HBM_BYTES * FIT_FRAC]
        if not fitting:
            print("nothing fits; not running")
            return
        b, donate = max(fitting)
        compiled, v, im, win, _ = results[(b, donate)]
        print(f"\nexecuting B={b} donate={int(donate)} ...")
        host_im = np.asarray(jax.device_get(im))
        out = compiled(v, jax.device_put(host_im), win)
        np.asarray(out["detections"])  # sync
        iters = 4
        t0 = time.perf_counter()
        for _ in range(iters):
            # fresh upload each iter: the donated buffer is consumed, and the
            # real eval loop uploads new images every batch anyway
            out = compiled(v, jax.device_put(host_im), win)
            np.asarray(out["detections"])
        dt = (time.perf_counter() - t0) / iters
        print(f"B={b}: {dt*1e3:.1f} ms/batch = {b/dt:.1f} img/s (incl. H2D)")


if __name__ == "__main__":
    main()
