"""CLI entry point.

Capability parity with ``/root/reference/main.py``::

    python main.py --phase {train,inference,visualize} \
        [--config_name NAME] [--config_file cfg.yaml] [--debug 0|1] \
        [--device_id 0] [--data_root PATH] [KEY.SUBKEY VALUE ...]

Train runs the reference's 3-stage schedule (heads → 4+ → all,
/root/reference/main.py:65-82) with checkpoint resume; inference runs the
COCO eval loop; visualize dumps per-detection 1024-d classifier features
(the t-SNE feature pipeline, lib/workflow.py:449-451).
"""

from __future__ import annotations

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser(description="InterNet TPU")
    p.add_argument("--phase", default="train",
                   choices=["train", "inference", "visualize"])
    p.add_argument("--config_name", default=None)
    p.add_argument("--config_file", default=None)
    p.add_argument("--debug", type=int, default=0)
    p.add_argument("--device_id", default="0",
                   help="kept for CLI parity; devices come from the JAX mesh")
    p.add_argument("--data_root", default=None)
    p.add_argument("--synthetic_data", action="store_true",
                   help="generate a synthetic COCO dataset (no-egress envs)")
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="KEY.SUBKEY VALUE overrides")
    return p.parse_args()


def main():
    args = parse_args()
    if args.synthetic_data:
        # must reach build_config BEFORE finalize(): QUICK_VERIFY derives
        # SHOW_INTERVAL/SAVE_FREQ_WITHIN_EPOCH there; prepended so explicit
        # user opts still win
        args.opts = ["CTRL.QUICK_VERIFY", "True"] + (args.opts or [])

    from feature_intertwiner_tpu.config import build_config
    cfg = build_config(
        config_name=args.config_name or "default",
        phase=args.phase,
        config_file=args.config_file,
        opts=args.opts,
        debug=bool(args.debug),
        make_dirs=True,
    )
    cfg.MISC.LOG_FILE = os.path.join(cfg.MISC.RESULT_FOLDER, "log.txt")

    import jax

    # Honor JAX_PLATFORMS even when a sitecustomize pinned another backend —
    # required to drive the SPMD paths on a virtual CPU mesh
    # (XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu).
    want = os.environ.get("JAX_PLATFORMS")
    if want and str(jax.config.jax_platforms or "") != want:
        jax.config.update("jax_platforms", want)

    if cfg.TPU.COMPILE_CACHE_DIR:
        jax.config.update("jax_compilation_cache_dir",
                          cfg.TPU.COMPILE_CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from feature_intertwiner_tpu.data import get_data
    from feature_intertwiner_tpu.models import InterNet
    from feature_intertwiner_tpu.parallel import make_mesh
    from feature_intertwiner_tpu.train.workflow import (
        Trainer, test_model, train_model)
    from feature_intertwiner_tpu.utils.logging import print_log

    data_root = args.data_root or cfg.DATASET.PATH
    if args.synthetic_data:
        from feature_intertwiner_tpu.data import synthetic
        synthetic.generate(data_root, num_images=8)

    print_log(f"devices: {jax.devices()}", cfg.MISC.LOG_FILE, init=True)
    cfg.display(lambda msg: print_log(msg, cfg.MISC.LOG_FILE,
                                      quiet_terminal=True))

    loader, val_dataset, val_api = get_data(cfg, data_root=data_root)
    # synthetic/small datasets have fewer classes than COCO's 81
    cfg.DATASET.NUM_CLASSES = val_dataset.num_classes

    dtypes = dict(bfloat16=jnp.bfloat16, float32=jnp.float32)
    model = InterNet.from_config(cfg, dtype=dtypes[cfg.TPU.COMPUTE_DTYPE])

    size = int(cfg.DATA.IMAGE_MAX_DIM)
    g = int(cfg.DATA.MAX_GT_INSTANCES)
    mh = (cfg.MRCNN.MINI_MASK_SHAPE[0] if cfg.MRCNN.USE_MINI_MASK else size)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(cfg.MISC.SEED),
         "sampling": jax.random.PRNGKey(0)},
        jnp.zeros((1, size, size, 3)), mode="train",
        gt_class_ids=jnp.zeros((1, g), jnp.int32),
        gt_boxes=jnp.zeros((1, g, 4)),
        gt_masks=jnp.zeros((1, g, mh, mh))))()

    n_dev = len(jax.devices())
    mesh = make_mesh() if n_dev > 1 else None
    trainer = Trainer(model, cfg, variables, mesh=mesh)
    trainer.resume()

    if args.phase == "train":
        if cfg.TRAIN.END2END:
            train_model(trainer, loader, "all", val_dataset=val_dataset,
                        val_api=val_api)
        else:
            for stage in ("heads", "4+", "all"):
                train_model(trainer, loader, stage, val_dataset=val_dataset,
                            val_api=val_api)
        return

    eval_vars = {"params": trainer.state.params}
    if trainer.state.batch_stats:
        eval_vars["batch_stats"] = trainer.state.batch_stats

    # TEST.DTYPE: optional fp32 (or bf16) eval pass independent of the
    # training compute dtype — params are fp32 either way, so the same
    # variables apply to the re-typed model.
    if cfg.TEST.DTYPE and cfg.TEST.DTYPE != cfg.TPU.COMPUTE_DTYPE:
        model = model.clone(dtype=dtypes[cfg.TEST.DTYPE])

    if args.phase == "inference":
        test_model(model, eval_vars, cfg, val_dataset, val_api,
                   epoch=trainer.epoch, mesh=mesh)
        return

    # visualize: dump per-detection 1024-d features for t-SNE tooling
    from feature_intertwiner_tpu.train.workflow import mold_inputs
    feats, dets_all = [], []

    @jax.jit
    def vis(v, im, win):
        return model.apply(v, im, mode="visualize", windows=win)

    for idx in val_dataset.image_ids:
        image = val_dataset.load_image(int(idx))
        molded, metas, windows = mold_inputs([image], cfg)
        out = jax.device_get(vis(eval_vars, jnp.asarray(molded),
                                 jnp.asarray(windows)))
        feats.append(np.asarray(out["features"][0]))
        dets_all.append(np.asarray(out["detections"][0]))
    out_path = os.path.join(cfg.MISC.RESULT_FOLDER, "features.npz")
    np.savez(out_path, features=np.stack(feats),
             detections=np.stack(dets_all))
    print_log(f"saved features to {out_path}", cfg.MISC.LOG_FILE)


if __name__ == "__main__":
    main()
