"""Pretrained-weight import: reference torch checkpoints and keras h5.

Capability parity with ``/root/reference/tools/convert_from_keras.py`` (the
Matterport-keras → reference-torch name mapping) plus the load path the
reference uses for its own ``.pth`` checkpoints
(``update_config_and_load_model``, tools/utils.py:321-325): both formats are
mapped into this framework's flax param/batch_stats trees.

Layout conversions:
- torch conv ``[O, I, kh, kw]``          → flax ``[kh, kw, I, O]``
- torch conv-transpose ``[I, O, kh, kw]`` → flax ConvTranspose ``[kh, kw, I, O]``
  (flax ConvTranspose convolves with the kernel, torch correlates with the
  flipped one — kernels are spatially flipped to compensate)
- torch linear ``[O, I]``                → flax Dense ``[I, O]``
- BN ``weight/bias/running_mean/running_var`` → ``scale/bias`` (params) +
  ``mean/var`` (batch_stats).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np
from flax import traverse_util

BOTTLENECKS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


def _conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _deconv(w):
    # [I, O, kh, kw] -> [kh, kw, I, O], spatially flipped
    return np.transpose(np.asarray(w), (2, 3, 0, 1))[::-1, ::-1]


def _linear(w):
    return np.transpose(np.asarray(w), (1, 0))


def _bn(dst_params, dst_stats, path, sd, src):
    """Map a torch BN layer at ``src`` into my BN wrapper at ``path``."""
    inner = f"{path}/BatchNorm_0"
    dst_params[f"{inner}/scale"] = np.asarray(sd[f"{src}.weight"])
    dst_params[f"{inner}/bias"] = np.asarray(sd[f"{src}.bias"])
    if f"{src}.running_mean" in sd:
        dst_stats[f"{inner}/mean"] = np.asarray(sd[f"{src}.running_mean"])
        dst_stats[f"{inner}/var"] = np.asarray(sd[f"{src}.running_var"])


class _TrackedSD(dict):
    """state_dict wrapper recording which source keys the converter read."""

    def __init__(self, sd):
        super().__init__(sd)
        self.used = set()

    def __getitem__(self, key):
        self.used.add(key)
        return super().__getitem__(key)


def _conv1d(w):
    # torch Conv1d [O, I, k] -> flax 1-D Conv [k, I, O]
    return np.transpose(np.asarray(w), (2, 1, 0))


def convert_reference_state_dict(
    sd: Dict[str, np.ndarray], arch: str = "resnet101",
    upsample_fac: float = 1.0, log_fn=None, strict: bool = False,
) -> Tuple[dict, dict]:
    """Reference MaskRCNN .pth state_dict -> (params, batch_stats) trees.

    Name map against /root/reference/lib/sub_module.py module structure
    (fpn.C* resnet stages, fpn.P*_conv laterals/outs, rpn.*, classifier.*,
    mask.*, dev_roi.*, the meta-OT ``ot_loss.*`` lib/model.py:66-67 and the
    FPN-OT ``fpn.p{2,3,4}_ot.*`` lib/sub_module.py:182-185).

    Every source key must either be consumed by the map or be a known
    non-weight (``num_batches_tracked``): leftovers are reported per key
    through ``log_fn`` and raise when ``strict=True`` — a silently-dropped
    layer can no longer masquerade as a successful conversion.
    """
    sd = _TrackedSD(sd)
    p: Dict[str, np.ndarray] = {}
    s: Dict[str, np.ndarray] = {}

    def conv_pair(dst, src):
        if f"{src}.weight" in sd:
            p[f"{dst}/kernel"] = _conv(sd[f"{src}.weight"])
            if f"{src}.bias" in sd:
                p[f"{dst}/bias"] = np.asarray(sd[f"{src}.bias"])

    # --- backbone (reference embeds resnet stages inside fpn.C*) ---------
    conv_pair("backbone/c1_conv", "fpn.C1.0")
    if "fpn.C1.1.weight" in sd:
        _bn(p, s, "backbone/c1_bn", sd, "fpn.C1.1")
    for stage_idx, blocks in zip((2, 3, 4, 5), BOTTLENECKS[arch]):
        for b in range(blocks):
            src = f"fpn.C{stage_idx}.{b}"
            dst = f"backbone/c{stage_idx}/block{b}"
            for i in (1, 2, 3):
                conv_pair(f"{dst}/conv{i}", f"{src}.conv{i}")
                if f"{src}.bn{i}.weight" in sd:
                    _bn(p, s, f"{dst}/bn{i}", sd, f"{src}.bn{i}")
            if f"{src}.downsample.0.weight" in sd:
                conv_pair(f"{dst}/proj_conv", f"{src}.downsample.0")
                _bn(p, s, f"{dst}/proj_bn", sd, f"{src}.downsample.1")

    # --- fpn -------------------------------------------------------------
    for lvl in (2, 3, 4, 5):
        conv_pair(f"fpn/p{lvl}_lateral", f"fpn.P{lvl}_conv1")
        conv_pair(f"fpn/p{lvl}_out", f"fpn.P{lvl}_conv2.1")

    # --- rpn -------------------------------------------------------------
    conv_pair("rpn/shared", "rpn.conv_shared")
    conv_pair("rpn/cls", "rpn.conv_class")
    conv_pair("rpn/bbox", "rpn.conv_bbox")

    # --- classifier ------------------------------------------------------
    conv_pair("classifier/fc1", "classifier.conv1")
    if "classifier.bn1.weight" in sd:
        _bn(p, s, "classifier/bn1", sd, "classifier.bn1")
    conv_pair("classifier/fc2", "classifier.conv2")
    if "classifier.bn2.weight" in sd:
        _bn(p, s, "classifier/bn2", sd, "classifier.bn2")
    for name in ("linear_class", "linear_bbox"):
        if f"classifier.{name}.weight" in sd:
            p[f"classifier/{name}/kernel"] = _linear(
                sd[f"classifier.{name}.weight"])
            p[f"classifier/{name}/bias"] = np.asarray(
                sd[f"classifier.{name}.bias"])

    # --- mask ------------------------------------------------------------
    for i in (1, 2, 3, 4):
        conv_pair(f"mask/conv{i}", f"mask.conv{i}")
        if f"mask.bn{i}.weight" in sd:
            _bn(p, s, f"mask/bn{i}", sd, f"mask.bn{i}")
    if "mask.deconv.weight" in sd:
        p["mask/upsample/kernel"] = _deconv(sd["mask.deconv.weight"])
        p["mask/upsample/bias"] = np.asarray(sd["mask.deconv.bias"])
    conv_pair("mask/logits", "mask.conv5")

    # --- dev (intertwiner) -----------------------------------------------
    # UPSAMPLE_FAC=1 built a Conv2d ([O,I,kh,kw]); FAC=2 a ConvTranspose2d
    # ([I,O,kh,kw]). The channel counts are equal so the layout is ambiguous
    # from shapes alone — ``upsample_fac`` selects the conversion.
    for m in range(4):
        src = f"dev_roi.upsample.{m}.0"
        if f"{src}.weight" in sd:
            w = np.asarray(sd[f"{src}.weight"])
            dst = f"dev/upsample{m}"
            if upsample_fac == 2.0:
                p[f"{dst}/deconv/kernel"] = _deconv(w)
                p[f"{dst}/deconv/bias"] = np.asarray(sd[f"{src}.bias"])
            else:
                p[f"{dst}/conv/kernel"] = _conv(w)
                p[f"{dst}/conv/bias"] = np.asarray(sd[f"{src}.bias"])
            _bn(p, s, f"{dst}/bn", sd, f"dev_roi.upsample.{m}.1")
    critic_map = {0: "conv1", 1: "bn1", 3: "conv2", 4: "bn2",
                  6: "conv3", 7: "bn3"}
    for idx, name in critic_map.items():
        src = f"dev_roi.feat_extract.{idx}"
        if name.startswith("conv"):
            conv_pair(f"dev/critic/{name}", src)
        elif f"{src}.weight" in sd:
            _bn(p, s, f"dev/critic/{name}", sd, src)
    if "dev_roi.big_fc_layer.weight" in sd:
        p["dev/big_fc/kernel"] = _linear(sd["dev_roi.big_fc_layer.weight"])
        p["dev/big_fc/bias"] = np.asarray(sd["dev_roi.big_fc_layer.bias"])

    # --- meta OT (LOSS_CHOICE='ot': ot_loss.G_net Conv1d + critic,
    # lib/OT_module.py:37-41,57-65) --------------------------------------
    if "ot_loss.G_net.0.weight" in sd:
        p["ot_loss/g_conv/kernel"] = _conv1d(sd["ot_loss.G_net.0.weight"])
        p["ot_loss/g_conv/bias"] = np.asarray(sd["ot_loss.G_net.0.bias"])
    if "ot_loss.critic.0.weight" in sd:       # OT_ONE_DIM_FORM='conv'
        p["ot_loss/critic_conv/kernel"] = _conv1d(
            sd["ot_loss.critic.0.weight"])
        p["ot_loss/critic_conv/bias"] = np.asarray(sd["ot_loss.critic.0.bias"])
    if "ot_loss.critic.weight" in sd:         # OT_ONE_DIM_FORM='fc' (Linear)
        p["ot_loss/critic_fc/kernel"] = _linear(sd["ot_loss.critic.weight"])
        p["ot_loss/critic_fc/bias"] = np.asarray(sd["ot_loss.critic.bias"])

    # --- FPN OT (TRAIN.FPN_OT_LOSS: fpn.p{2,3,4}_ot, ConvTranspose G_net +
    # 2-conv critic, lib/sub_module.py:182-185, OT_module.py:30-54) ------
    for lvl in (2, 3, 4):
        src = f"fpn.p{lvl}_ot"
        dst = f"fpn/p{lvl}_ot"
        if f"{src}.G_net.0.weight" not in sd:
            continue
        p[f"{dst}/g_deconv/kernel"] = _deconv(sd[f"{src}.G_net.0.weight"])
        p[f"{dst}/g_deconv/bias"] = np.asarray(sd[f"{src}.G_net.0.bias"])
        _bn(p, s, f"{dst}/g_bn", sd, f"{src}.G_net.1")
        for ci, (cname, bname) in enumerate(
                ((0, 1), (3, 4)), start=1):
            conv_pair(f"{dst}/critic_conv{ci}", f"{src}.critic.{cname}")
            _bn(p, s, f"{dst}/critic_bn{ci}", sd, f"{src}.critic.{bname}")

    unmapped = sorted(
        k for k in sd
        if k not in sd.used and not k.endswith("num_batches_tracked"))
    if unmapped:
        report = "\n".join(f"  UNMAPPED {k}  {tuple(np.shape(sd[k]))}"
                           for k in unmapped)
        msg = (f"convert_reference_state_dict: {len(unmapped)} source keys "
               f"have no mapping:\n{report}")
        if strict:
            raise ValueError(msg)
        (log_fn or print)(msg)

    return (traverse_util.unflatten_dict(
                {tuple(k.split("/")): v for k, v in p.items()}),
            traverse_util.unflatten_dict(
                {tuple(k.split("/")): v for k, v in s.items()}))


# ---------------------------------------------------------------------------
# Matterport keras h5 (parity: tools/convert_from_keras.py:8-110)
# ---------------------------------------------------------------------------
_KERAS_BLOCK_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def _keras_block_name(stage: int, block: int, blocks_in_stage: int) -> str:
    # keras resnet block suffixes are letters 'a', 'b', 'c', ... for every
    # stage, including the 23-block resnet101 stage 4 ('a'..'w') — confirmed
    # against the reference converter (convert_from_keras.py:79-83).
    return _KERAS_BLOCK_LETTERS[block]


def convert_keras_h5(h5_path: str, arch: str = "resnet101") -> Tuple[dict, dict]:
    """Matterport Mask-RCNN keras weights -> (params, batch_stats)."""
    import h5py

    p: Dict[str, np.ndarray] = {}
    s: Dict[str, np.ndarray] = {}

    with h5py.File(h5_path, "r") as f:
        layers = f["model_weights"] if "model_weights" in f else f

        def get(layer, weight):
            grp = layers[layer]
            # keras nests layer/layer/weight
            if layer in grp:
                grp = grp[layer]
            return np.asarray(grp[weight])

        def kconv(dst, layer, bias=True):
            p[f"{dst}/kernel"] = get(layer, "kernel:0")  # keras is HWIO already
            if bias:
                p[f"{dst}/bias"] = get(layer, "bias:0")

        def kdeconv(dst, layer):
            # keras Conv2DTranspose stores [kh, kw, OUT, IN] with gradient
            # semantics (same as torch); flax ConvTranspose convolves with a
            # [kh, kw, IN, OUT] kernel -> swap the channel dims and flip
            # spatially (composition of the reference converter's blanket
            # (3,2,0,1) keras->torch transpose with _deconv)
            w = get(layer, "kernel:0")
            p[f"{dst}/kernel"] = np.ascontiguousarray(
                np.transpose(w, (0, 1, 3, 2))[::-1, ::-1])
            p[f"{dst}/bias"] = get(layer, "bias:0")

        def kbn(dst, layer):
            inner = f"{dst}/BatchNorm_0"
            p[f"{inner}/scale"] = get(layer, "gamma:0")
            p[f"{inner}/bias"] = get(layer, "beta:0")
            s[f"{inner}/mean"] = get(layer, "moving_mean:0")
            s[f"{inner}/var"] = get(layer, "moving_variance:0")

        kconv("backbone/c1_conv", "conv1")
        kbn("backbone/c1_bn", "bn_conv1")
        branch = {"conv1": "2a", "conv2": "2b", "conv3": "2c"}
        for stage_idx, blocks in zip((2, 3, 4, 5), BOTTLENECKS[arch]):
            for b in range(blocks):
                letter = _keras_block_name(stage_idx, b, blocks)
                dst = f"backbone/c{stage_idx}/block{b}"
                for mine, br in branch.items():
                    kconv(f"{dst}/{mine}", f"res{stage_idx}{letter}_branch{br}")
                    kbn(f"{dst}/bn{mine[-1]}", f"bn{stage_idx}{letter}_branch{br}")
                if b == 0:
                    kconv(f"{dst}/proj_conv", f"res{stage_idx}{letter}_branch1")
                    kbn(f"{dst}/proj_bn", f"bn{stage_idx}{letter}_branch1")

        for lvl, lat in ((5, "fpn_c5p5"), (4, "fpn_c4p4"), (3, "fpn_c3p3"),
                         (2, "fpn_c2p2")):
            kconv(f"fpn/p{lvl}_lateral", lat)
            kconv(f"fpn/p{lvl}_out", f"fpn_p{lvl}")

        kconv("rpn/shared", "rpn_conv_shared")
        kconv("rpn/cls", "rpn_class_raw")
        kconv("rpn/bbox", "rpn_bbox_pred")

        kconv("classifier/fc1", "mrcnn_class_conv1")
        kbn("classifier/bn1", "mrcnn_class_bn1")
        kconv("classifier/fc2", "mrcnn_class_conv2")
        kbn("classifier/bn2", "mrcnn_class_bn2")
        kconv("classifier/linear_class", "mrcnn_class_logits")
        kconv("classifier/linear_bbox", "mrcnn_bbox_fc")

        for i in (1, 2, 3, 4):
            kconv(f"mask/conv{i}", f"mrcnn_mask_conv{i}")
            kbn(f"mask/bn{i}", f"mrcnn_mask_bn{i}")
        kdeconv("mask/upsample", "mrcnn_mask_deconv")
        kconv("mask/logits", "mrcnn_mask")

    return (traverse_util.unflatten_dict(
                {tuple(k.split("/")): v for k, v in p.items()}),
            traverse_util.unflatten_dict(
                {tuple(k.split("/")): v for k, v in s.items()}))


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth into a plain name->numpy dict (cpu)."""
    return load_reference_checkpoint(path)[0]


def load_reference_checkpoint(path: str) -> Tuple[Dict[str, np.ndarray], dict]:
    """Load a reference .pth: (state_dict as name->numpy, payload extras).

    The reference's ``save_model`` payload (tools/utils.py:579-586) carries
    ``state_dict, epoch, iter, buffer, buffer_cnt, loss_data``; extras
    returns everything beyond the weights so resume can restore the
    intertwiner buffer and the epoch/iter counters."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload) if isinstance(payload, dict) else payload
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            out[re.sub(r"^module\.", "", k)] = v.numpy()
    extras = {}
    if isinstance(payload, dict):
        for k in ("epoch", "iter", "buffer", "buffer_cnt", "loss_data"):
            if k in payload:
                v = payload[k]
                extras[k] = v.numpy() if hasattr(v, "numpy") else v
    return out, extras


def merge_pretrained(params: dict, batch_stats: dict,
                     loaded_params: dict, loaded_stats: dict,
                     log_fn=print) -> Tuple[dict, dict]:
    """Overlay loaded weights onto initialized trees (strict=False load:
    report missing/unexpected like utils.py:434-443)."""
    def overlay(dst_tree, src_tree, label):
        dst = traverse_util.flatten_dict(dst_tree)
        src = traverse_util.flatten_dict(src_tree)
        missing, used, mismatched = [], 0, []
        for k in dst:
            if k in src:
                if np.asarray(src[k]).shape == np.asarray(dst[k]).shape:
                    dst[k] = np.asarray(src[k], dtype=np.asarray(dst[k]).dtype)
                    used += 1
                else:
                    mismatched.append("/".join(k))
            else:
                missing.append("/".join(k))
        unexpected = [k for k in src if k not in dst]
        log_fn(f"[{label}] loaded {used}, from-scratch {len(missing)}, "
               f"shape-mismatch {len(mismatched)}, unused {len(unexpected)}")
        return traverse_util.unflatten_dict(dst)

    return (overlay(params, loaded_params, "params"),
            overlay(batch_stats, loaded_stats, "batch_stats"))


def apply_cross_name_init(params: dict, init_list: Dict[str, str],
                          log_fn=print) -> dict:
    """Copy weights between differently-named leaves of one tree.

    Parity with ``_load_state_dict_anyway`` + ``DEV.BIG_FC_INIT_LIST``
    (tools/utils.py:455-471, lib/config.py:358-363): e.g. seed
    ``dev/big_fc`` from ``classifier/linear_class``. Mapping entries are
    '/'-joined param paths {target: source}; shape-mismatched copies skip.
    """
    flat = traverse_util.flatten_dict(params)
    flat = {"/".join(k): v for k, v in flat.items()}
    for dst, src in (init_list or {}).items():
        if src not in flat or dst not in flat:
            log_fn(f"[cross-init] skip {dst} <- {src} (missing)")
            continue
        if np.asarray(flat[src]).shape != np.asarray(flat[dst]).shape:
            log_fn(f"[cross-init] skip {dst} <- {src} (shape mismatch)")
            continue
        flat[dst] = flat[src]
        log_fn(f"[cross-init] {dst} <- {src}")
    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in flat.items()})


def _cli():
    """CLI (parity: tools/convert_from_keras.py is a conversion CLI)::

        python -m feature_intertwiner_tpu.utils.convert_weights \
            --input weights.h5|ckpt.pth --format keras|reference \
            --arch resnet101 --output converted.npz
    """
    import argparse

    p = argparse.ArgumentParser(description="Convert pretrained weights")
    p.add_argument("--input", required=True)
    p.add_argument("--format", choices=["keras", "reference"], required=True)
    p.add_argument("--arch", default="resnet101")
    p.add_argument("--upsample_fac", type=float, default=1.0)
    p.add_argument("--output", required=True)
    args = p.parse_args()

    if args.format == "keras":
        params, stats = convert_keras_h5(args.input, args.arch)
    else:
        sd = load_torch_checkpoint(args.input)
        params, stats = convert_reference_state_dict(
            sd, args.arch, upsample_fac=args.upsample_fac)

    flat_p = {"params/" + "/".join(k): v for k, v in
              traverse_util.flatten_dict(params).items()}
    flat_s = {"batch_stats/" + "/".join(k): v for k, v in
              traverse_util.flatten_dict(stats).items()}
    np.savez(args.output, **flat_p, **flat_s)
    print(f"wrote {len(flat_p)} params + {len(flat_s)} stats to {args.output}")


def load_converted_npz(path: str):
    """Load an npz produced by the CLI back into (params, batch_stats)."""
    data = np.load(path)
    p, s = {}, {}
    for key in data.files:
        if key.startswith("params/"):
            p[tuple(key[len("params/"):].split("/"))] = data[key]
        elif key.startswith("batch_stats/"):
            s[tuple(key[len("batch_stats/"):].split("/"))] = data[key]
    return (traverse_util.unflatten_dict(p), traverse_util.unflatten_dict(s))


if __name__ == "__main__":
    _cli()
