"""Checkpoint save/load and torch-state-dict conversion.

Plays the role of the reference's offline export layer (reference
segment/export2.py and embeddings/export3.py turn HF/speechbrain torch
checkpoints into ONNX blobs): here, torch state dicts convert once into our
parameter pytrees and persist as flat .npz files — no ONNX, no torch at
inference time.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from .ecapa import EcapaConfig, init_ecapa
from .pyannet import PyanNetConfig, init_pyannet

# ---------------------------------------------------------------------------
# flat (de)serialization
# ---------------------------------------------------------------------------


def flatten_pytree(tree, prefix="") -> Dict[str, np.ndarray]:
    flat = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            flat.update(flatten_pytree(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(flatten_pytree(v, f"{prefix}{i}."))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def unflatten_pytree(flat: Dict[str, np.ndarray]):
    root: Dict = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_checkpoint(directory: str, params: Dict) -> None:
    """Write params["segmentation"] / params["embedding"] as .npz files."""
    os.makedirs(directory, exist_ok=True)
    for name, tree in params.items():
        np.savez(os.path.join(directory, f"{name}.npz"), **flatten_pytree(tree))


def load_checkpoint(directory: str) -> Dict:
    params = {}
    for name in ("segmentation", "embedding"):
        path = os.path.join(directory, f"{name}.npz")
        if os.path.exists(path):
            with np.load(path) as data:
                params[name] = unflatten_pytree({k: data[k] for k in data.files})
    if not params:
        raise FileNotFoundError(f"no checkpoint files in {directory}")
    return params


# ---------------------------------------------------------------------------
# torch state-dict converters
# ---------------------------------------------------------------------------


def _bn(sd, prefix):
    return {
        "weight": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
        "running_mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
        "running_var": jnp.asarray(sd[f"{prefix}.running_var"]),
    }


def _conv(sd, prefix):
    p = {"weight": jnp.asarray(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def _tdnn(sd, prefix):
    """speechbrain TDNNBlock: {prefix}.conv.conv.* + {prefix}.norm.norm.*"""
    return {"conv": _conv(sd, f"{prefix}.conv.conv"), "bn": _bn(sd, f"{prefix}.norm.norm")}


def ecapa_from_speechbrain(state_dict: Mapping, cfg: EcapaConfig = EcapaConfig()) -> Dict:
    """Map a speechbrain ECAPA_TDNN (spkrec-ecapa-voxceleb embedding_model)
    state dict onto our pytree.

    speechbrain module paths: blocks.0 (TDNN), blocks.1..3 (SERes2NetBlock
    with tdnn1 / res2net_block.blocks.N / tdnn2 / se_block.{conv1,conv2}),
    mfa, asp.{tdnn,conv}, asp_bn, fc.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def se_res2net(i):
        base = f"blocks.{i}"
        return {
            "tdnn1": _tdnn(sd, f"{base}.tdnn1"),
            "res2net": {
                "blocks": [
                    _tdnn(sd, f"{base}.res2net_block.blocks.{j}")
                    for j in range(cfg.res2net_scale - 1)
                ]
            },
            "tdnn2": _tdnn(sd, f"{base}.tdnn2"),
            "se": {
                "conv1": _conv(sd, f"{base}.se_block.conv1.conv"),
                "conv2": _conv(sd, f"{base}.se_block.conv2.conv"),
            },
        }

    return {
        "block0": _tdnn(sd, "blocks.0"),
        "block1": se_res2net(1),
        "block2": se_res2net(2),
        "block3": se_res2net(3),
        "mfa": _tdnn(sd, "mfa"),
        "asp": {
            "tdnn": _tdnn(sd, "asp.tdnn"),
            "conv": _conv(sd, "asp.conv.conv"),
        },
        "asp_bn": _bn(sd, "asp_bn.norm"),
        "fc": _conv(sd, "fc.conv"),
    }


def pyannet_from_pyannote(state_dict: Mapping, cfg: PyanNetConfig = PyanNetConfig()) -> Dict:
    """Map a pyannote PyanNet (pyannote/segmentation@2022.07) state dict onto
    our pytree.

    pyannote module paths: sincnet.wav_norm1d, sincnet.conv1d.{0,1,2},
    sincnet.norm1d.{0,1,2}, lstm.weight_*_l{i}[_reverse],
    linear.{0,1}, classifier. The sinc filterbank parameters are the
    (low_hz_, band_hz_) pair of conv1d.0 (asteroid ParamSincFB).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def in1d(prefix):
        return {
            "weight": jnp.asarray(sd[f"{prefix}.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.bias"]),
        }

    def lin(prefix):
        return {
            "weight": jnp.asarray(sd[f"{prefix}.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.bias"]),
        }

    # sinc parameter naming differs across pyannote/asteroid versions
    low_key = next(k for k in sd if k.endswith("low_hz_"))
    band_key = next(k for k in sd if k.endswith("band_hz_"))

    lstm_layers = []
    for i in range(cfg.lstm_layers):
        lstm_layers.append(
            {
                "fwd": {
                    "weight_ih": jnp.asarray(sd[f"lstm.weight_ih_l{i}"]),
                    "weight_hh": jnp.asarray(sd[f"lstm.weight_hh_l{i}"]),
                    "bias_ih": jnp.asarray(sd[f"lstm.bias_ih_l{i}"]),
                    "bias_hh": jnp.asarray(sd[f"lstm.bias_hh_l{i}"]),
                },
                "bwd": {
                    "weight_ih": jnp.asarray(sd[f"lstm.weight_ih_l{i}_reverse"]),
                    "weight_hh": jnp.asarray(sd[f"lstm.weight_hh_l{i}_reverse"]),
                    "bias_ih": jnp.asarray(sd[f"lstm.bias_ih_l{i}_reverse"]),
                    "bias_hh": jnp.asarray(sd[f"lstm.bias_hh_l{i}_reverse"]),
                },
            }
        )

    return {
        "sincnet": {
            "wav_norm": in1d("sincnet.wav_norm1d"),
            "sinc": {
                "low_hz": jnp.asarray(sd[low_key]),
                "band_hz": jnp.asarray(sd[band_key]),
            },
            "norm0": in1d("sincnet.norm1d.0"),
            "conv1": _conv(sd, "sincnet.conv1d.1"),
            "norm1": in1d("sincnet.norm1d.1"),
            "conv2": _conv(sd, "sincnet.conv1d.2"),
            "norm2": in1d("sincnet.norm1d.2"),
        },
        "lstm": lstm_layers,
        "linear": [lin(f"linear.{i}") for i in range(cfg.linear_layers)],
        "classifier": lin("classifier"),
    }


# ---------------------------------------------------------------------------
# inverse converters: pytree -> published torch state-dict layouts
# (the export direction of the reference's offline layer — lets weights
# trained or fine-tuned HERE be consumed by pyannote/speechbrain tooling,
# and drives the independent torch oracles in tests/twin_oracle.py)
# ---------------------------------------------------------------------------


def _np(x):
    return np.asarray(x)


def ecapa_to_speechbrain(params: Dict) -> Dict[str, np.ndarray]:
    """Inverse of ``ecapa_from_speechbrain``: our ECAPA pytree -> the
    spkrec-ecapa-voxceleb embedding_model state-dict key layout."""
    sd: Dict[str, np.ndarray] = {}

    def put_conv(prefix, p):
        sd[f"{prefix}.weight"] = _np(p["weight"])
        if "bias" in p:
            sd[f"{prefix}.bias"] = _np(p["bias"])

    def put_bn(prefix, p):
        for k in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{prefix}.{k}"] = _np(p[k])

    def put_tdnn(prefix, p):
        put_conv(f"{prefix}.conv.conv", p["conv"])
        put_bn(f"{prefix}.norm.norm", p["bn"])

    put_tdnn("blocks.0", params["block0"])
    for i in (1, 2, 3):
        blk = params[f"block{i}"]
        put_tdnn(f"blocks.{i}.tdnn1", blk["tdnn1"])
        for j, sub in enumerate(blk["res2net"]["blocks"]):
            put_tdnn(f"blocks.{i}.res2net_block.blocks.{j}", sub)
        put_tdnn(f"blocks.{i}.tdnn2", blk["tdnn2"])
        put_conv(f"blocks.{i}.se_block.conv1.conv", blk["se"]["conv1"])
        put_conv(f"blocks.{i}.se_block.conv2.conv", blk["se"]["conv2"])
    put_tdnn("mfa", params["mfa"])
    put_tdnn("asp.tdnn", params["asp"]["tdnn"])
    put_conv("asp.conv.conv", params["asp"]["conv"])
    put_bn("asp_bn.norm", params["asp_bn"])
    put_conv("fc.conv", params["fc"])
    return sd


def pyannet_to_pyannote(params: Dict) -> Dict[str, np.ndarray]:
    """Inverse of ``pyannet_from_pyannote``: our PyanNet pytree -> the
    pyannote/segmentation state-dict key layout. Requires parametric sinc
    filters (a pytree ingested from a constant-folded ONNX export carries
    baked ``filters`` and cannot round-trip)."""
    sn = params["sincnet"]
    if "low_hz" not in sn["sinc"]:
        raise ValueError(
            "pytree carries baked sinc filters (no low_hz/band_hz); "
            "cannot export to the parametric pyannote layout"
        )
    sd: Dict[str, np.ndarray] = {
        "sincnet.wav_norm1d.weight": _np(sn["wav_norm"]["weight"]),
        "sincnet.wav_norm1d.bias": _np(sn["wav_norm"]["bias"]),
        "sincnet.conv1d.0.low_hz_": _np(sn["sinc"]["low_hz"]),
        "sincnet.conv1d.0.band_hz_": _np(sn["sinc"]["band_hz"]),
    }
    for i, name in ((0, "norm0"), (1, "norm1"), (2, "norm2")):
        sd[f"sincnet.norm1d.{i}.weight"] = _np(sn[name]["weight"])
        sd[f"sincnet.norm1d.{i}.bias"] = _np(sn[name]["bias"])
    for i, name in ((1, "conv1"), (2, "conv2")):
        sd[f"sincnet.conv1d.{i}.weight"] = _np(sn[name]["weight"])
        sd[f"sincnet.conv1d.{i}.bias"] = _np(sn[name]["bias"])
    for i, layer in enumerate(params["lstm"]):
        for tag, half in (("", layer["fwd"]), ("_reverse", layer["bwd"])):
            sd[f"lstm.weight_ih_l{i}{tag}"] = _np(half["weight_ih"])
            sd[f"lstm.weight_hh_l{i}{tag}"] = _np(half["weight_hh"])
            sd[f"lstm.bias_ih_l{i}{tag}"] = _np(half["bias_ih"])
            sd[f"lstm.bias_hh_l{i}{tag}"] = _np(half["bias_hh"])
    for i, lin in enumerate(params["linear"]):
        sd[f"linear.{i}.weight"] = _np(lin["weight"])
        sd[f"linear.{i}.bias"] = _np(lin["bias"])
    sd["classifier.weight"] = _np(params["classifier"]["weight"])
    sd["classifier.bias"] = _np(params["classifier"]["bias"])
    return sd


def random_params(seed: int = 0) -> Dict:
    """Random-weight parameter set (no pretrained checkpoints ship with this
    repo; use the converters above with your own torch checkpoints)."""
    import jax

    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return {
        "segmentation": init_pyannet(k1),
        "embedding": init_ecapa(k2),
    }
