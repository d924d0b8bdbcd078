"""Real-artifact ingestion tests (models/ingest.py).

Fixtures are written in the REAL container formats the published models ship
in — actual ``torch.save`` zip archives (what pyannote Lightning checkpoints
and speechbrain savedirs contain) and actual ONNX protobuf (the layout of
the reference's segment2.onnx / emd4.onnx, segment/export2.py:40-52,
embeddings/export3.py:151-190) — not pre-extracted dicts.
"""

import os
import struct

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pyannote_audio_speaker_diarization_cpp_tpu.models import convert, ingest  # noqa: E402
from pyannote_audio_speaker_diarization_cpp_tpu.models import ecapa as E  # noqa: E402
from pyannote_audio_speaker_diarization_cpp_tpu.models import pyannet as P  # noqa: E402

from test_convert_real_scale import (  # noqa: E402
    make_pyannote_pyannet_state_dict,
    make_speechbrain_ecapa_state_dict,
)


def _leaves_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


# ---------------------------------------------------------------------------
# pure-python torch-zip reader
# ---------------------------------------------------------------------------


class WeirdHyperparams:
    """Stand-in for the arbitrary objects Lightning pickles into
    hyper_parameters (task specs, omegaconf containers, ...)."""

    def __init__(self):
        self.nested = {"a": [1, 2, {"b": object}]}


def test_read_torch_checkpoint_matches_torch_load(tmp_path):
    rng = np.random.default_rng(0)
    payload = {
        "f32": torch.from_numpy(rng.normal(size=(3, 5)).astype(np.float32)),
        "f64": torch.from_numpy(rng.normal(size=(7,)).astype(np.float64)),
        "i64": torch.from_numpy(rng.integers(0, 100, size=(4, 2))),
        "i32": torch.from_numpy(rng.integers(0, 100, size=(6,)).astype(np.int32)),
        "scalar": torch.tensor(1000, dtype=torch.int64),
        "bool": torch.tensor([True, False, True]),
        "f16": torch.from_numpy(rng.normal(size=(5,)).astype(np.float16)),
    }
    path = str(tmp_path / "mix.ckpt")
    torch.save(payload, path)

    loaded = ingest.read_torch_checkpoint(path)
    ref = torch.load(path, map_location="cpu", weights_only=True)
    assert set(loaded) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(loaded[k], ref[k].numpy())
        assert loaded[k].dtype == ref[k].numpy().dtype


def test_read_torch_checkpoint_bfloat16(tmp_path):
    x = torch.arange(16, dtype=torch.float32).reshape(4, 4) / 7.0
    path = str(tmp_path / "bf16.ckpt")
    torch.save({"w": x.to(torch.bfloat16)}, path)
    loaded = ingest.read_torch_checkpoint(path)
    np.testing.assert_array_equal(
        loaded["w"], torch.load(path, weights_only=True)["w"].float().numpy()
    )


def test_read_torch_checkpoint_noncontiguous_view(tmp_path):
    """Tensors saved from views exercise storage_offset/stride handling."""
    base = torch.arange(24, dtype=torch.float32).reshape(4, 6)
    view = base[1:, ::2]  # offset 6, strides (6, 2)
    path = str(tmp_path / "view.ckpt")
    torch.save({"v": view, "t": base.t()}, path)
    loaded = ingest.read_torch_checkpoint(path)
    np.testing.assert_array_equal(loaded["v"], view.numpy())
    np.testing.assert_array_equal(loaded["t"], base.t().numpy())


def test_read_torch_checkpoint_stubs_foreign_objects(tmp_path):
    """Lightning-style payload: arbitrary pickled objects must not break the
    reader, and the state_dict tensors must come through bit-exact."""
    sd = {"layer.weight": torch.randn(3, 3), "layer.bias": torch.randn(3)}
    ckpt = {
        "state_dict": sd,
        "hyper_parameters": WeirdHyperparams(),
        "pytorch-lightning_version": "1.9.0",
        "epoch": 42,
        "optimizer_states": [{"momentum": WeirdHyperparams()}],
    }
    path = str(tmp_path / "lightning.ckpt")
    torch.save(ckpt, path)
    loaded = ingest.read_torch_checkpoint(path)
    assert loaded["epoch"] == 42
    for k in sd:
        np.testing.assert_array_equal(loaded["state_dict"][k], sd[k].numpy())
    # the stubbed object is inert, not an error
    assert isinstance(loaded["hyper_parameters"], ingest._Stub)


# ---------------------------------------------------------------------------
# pyannote Lightning checkpoint -> segmentation params
# ---------------------------------------------------------------------------


def test_load_pyannote_lightning_checkpoint(tmp_path):
    rng = np.random.default_rng(1)
    sd_np = make_pyannote_pyannet_state_dict(rng)
    ckpt = {
        "state_dict": {k: torch.from_numpy(v.copy()) for k, v in sd_np.items()},
        "hyper_parameters": WeirdHyperparams(),
        "pytorch-lightning_version": "1.9.0",
    }
    path = str(tmp_path / "pytorch_model.bin")
    torch.save(ckpt, path)

    params = ingest.load_pyannote_checkpoint(path)
    _leaves_equal(params, convert.pyannet_from_pyannote(sd_np))


# ---------------------------------------------------------------------------
# speechbrain savedir -> embedding params
# ---------------------------------------------------------------------------


def test_load_speechbrain_savedir(tmp_path):
    rng = np.random.default_rng(2)
    sd_np = make_speechbrain_ecapa_state_dict(rng)
    savedir = tmp_path / "pretrained"
    savedir.mkdir()
    torch.save(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd_np.items()},
        str(savedir / "embedding_model.ckpt"),
    )

    params = ingest.load_speechbrain_checkpoint(str(savedir))
    _leaves_equal(params, convert.ecapa_from_speechbrain(sd_np))
    # the .ckpt file directly also works
    params2 = ingest.load_speechbrain_checkpoint(str(savedir / "embedding_model.ckpt"))
    _leaves_equal(params, params2)


# ---------------------------------------------------------------------------
# minimal ONNX protobuf encoder (test fixture writer)
# ---------------------------------------------------------------------------


def _pb_varint(v):
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _pb_field(field, wire, payload):
    tag = _pb_varint((field << 3) | wire)
    if wire == 2:
        return tag + _pb_varint(len(payload)) + payload
    return tag + payload


def _pb_tensor(name, arr):
    arr = np.ascontiguousarray(arr)
    dt = {"float32": 1, "float64": 11, "int64": 7}[str(arr.dtype)]
    msg = b"".join(_pb_field(1, 0, _pb_varint(d)) for d in arr.shape)
    msg += _pb_field(2, 0, _pb_varint(dt))
    msg += _pb_field(8, 2, name.encode())
    msg += _pb_field(9, 2, arr.tobytes())
    return msg


def _pb_node(op_type, inputs, outputs, name="", int_attrs=None):
    msg = b"".join(_pb_field(1, 2, i.encode()) for i in inputs)
    msg += b"".join(_pb_field(2, 2, o.encode()) for o in outputs)
    msg += _pb_field(3, 2, name.encode())
    msg += _pb_field(4, 2, op_type.encode())
    for aname, aval in (int_attrs or {}).items():
        attr = _pb_field(1, 2, aname.encode())  # AttributeProto.name
        attr += _pb_field(3, 0, _pb_varint(aval))  # AttributeProto.i
        attr += _pb_field(20, 0, _pb_varint(2))  # type = INT
        msg += _pb_field(5, 2, attr)
    return msg


def _pb_model(initializers, nodes):
    graph = b"".join(_pb_field(1, 2, n) for n in nodes)
    graph += _pb_field(2, 2, b"graph")
    graph += b"".join(_pb_field(5, 2, t) for t in initializers)
    model = _pb_field(1, 0, _pb_varint(8))  # ir_version
    model += _pb_field(7, 2, graph)
    return model


def _torch_lstm_to_onnx(sd, layer):
    """Forward transformation torch nn.LSTM -> ONNX LSTM tensors, the way
    torch.onnx's symbolic does it: gate reorder [i,f,g,o] -> [i,o,f,c],
    stacked (2, ...) for bidirectional, B = [Wb | Rb]."""
    perm = [0, 3, 1, 2]

    def reorder(x):
        h4 = x.shape[0]
        return x.reshape(4, h4 // 4, *x.shape[1:])[perm].reshape(x.shape)

    Ws, Rs, Bs = [], [], []
    for tag in ("", "_reverse"):
        Ws.append(reorder(sd[f"lstm.weight_ih_l{layer}{tag}"]))
        Rs.append(reorder(sd[f"lstm.weight_hh_l{layer}{tag}"]))
        Bs.append(
            np.concatenate(
                [
                    reorder(sd[f"lstm.bias_ih_l{layer}{tag}"]),
                    reorder(sd[f"lstm.bias_hh_l{layer}{tag}"]),
                ]
            )
        )
    return np.stack(Ws), np.stack(Rs), np.stack(Bs)


def _write_segment_onnx(path, sd, cfg, folded):
    """Emulate segment2.onnx: if ``folded`` the sinc params are baked into a
    Conv weight and the LSTMs appear as ONNX LSTM nodes with reordered
    gates (what do_constant_folding=True + the LSTM symbolic produce);
    otherwise parameter initializers keep their state-dict names."""
    inits, nodes = [], []
    skip = set()
    if folded:
        # baked sinc conv weight (constant-folded from low_hz_/band_hz_)
        filters = np.asarray(
            P.sinc_filters(
                {
                    "low_hz": jnp.asarray(sd["sincnet.conv1d.0.low_hz_"]),
                    "band_hz": jnp.asarray(sd["sincnet.conv1d.0.band_hz_"]),
                },
                cfg,
            )
        )
        inits.append(_pb_tensor("onnx::Conv_412", filters))
        nodes.append(
            _pb_node("Conv", ["/sincnet/norm_out", "onnx::Conv_412"], ["/sincnet/c0"])
        )
        skip.update(k for k in sd if ".conv1d.0." in k)
        # LSTM nodes
        x_name = "/lstm_in"
        for layer in range(cfg.lstm_layers):
            W, R, B = _torch_lstm_to_onnx(sd, layer)
            wn, rn, bn = (f"onnx::LSTM_{layer}_{t}" for t in "WRB")
            inits += [_pb_tensor(wn, W), _pb_tensor(rn, R), _pb_tensor(bn, B)]
            out = f"/lstm_{layer}_out"
            nodes.append(_pb_node("LSTM", [x_name, wn, rn, bn], [out]))
            x_name = out
        skip.update(k for k in sd if k.startswith("lstm."))
    for k, v in sd.items():
        if k not in skip:
            inits.append(_pb_tensor(k, np.asarray(v)))
    with open(path, "wb") as f:
        f.write(_pb_model(inits, nodes))


def test_pyannet_from_onnx_named_params(tmp_path):
    cfg = P.PyanNetConfig()
    rng = np.random.default_rng(3)
    sd = make_pyannote_pyannet_state_dict(rng, cfg)
    path = str(tmp_path / "segment2.onnx")
    _write_segment_onnx(path, sd, cfg, folded=False)
    params = ingest.pyannet_from_onnx(path, cfg)
    _leaves_equal(params, convert.pyannet_from_pyannote(sd, cfg))


def test_pyannet_from_onnx_folded_filters_and_lstm_nodes(tmp_path):
    cfg = P.PyanNetConfig()
    rng = np.random.default_rng(4)
    sd = make_pyannote_pyannet_state_dict(rng, cfg)
    path = str(tmp_path / "segment2.onnx")
    _write_segment_onnx(path, sd, cfg, folded=True)
    params = ingest.pyannet_from_onnx(path, cfg)
    direct = convert.pyannet_from_pyannote(sd, cfg)

    # LSTM gate-reorder roundtrip is exact
    for layer_i, layer_d in zip(params["lstm"], direct["lstm"]):
        _leaves_equal(layer_i, layer_d)
    # baked filters == the filters the sinc params generate
    np.testing.assert_allclose(
        np.asarray(params["sincnet"]["sinc"]["filters"]),
        np.asarray(P.sinc_filters(direct["sincnet"]["sinc"], cfg)),
        rtol=1e-6,
        atol=1e-7,
    )
    # forward parity on a short window (covers the "filters" fast path)
    x = (0.1 * rng.normal(size=(1, 8000))).astype(np.float32)
    a = np.asarray(P.pyannet_forward(params, jnp.asarray(x), cfg))
    b = np.asarray(P.pyannet_forward(direct, jnp.asarray(x), cfg))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_ecapa_from_onnx(tmp_path):
    cfg = E.EcapaConfig()
    rng = np.random.default_rng(5)
    sd = make_speechbrain_ecapa_state_dict(rng, cfg)
    inits = [
        _pb_tensor(f"embedding_model.{k}", np.asarray(v))
        for k, v in sd.items()
        if not k.endswith("num_batches_tracked")
    ]
    # emd4.onnx also carries the constant-folded mel filterbank matrix
    inits.append(_pb_tensor("onnx::MatMul_7", rng.normal(size=(201, 80)).astype(np.float32)))
    path = str(tmp_path / "emd4.onnx")
    with open(path, "wb") as f:
        f.write(_pb_model(inits, []))
    params = ingest.ecapa_from_onnx(path, cfg)
    _leaves_equal(params, convert.ecapa_from_speechbrain(sd, cfg))


# ---------------------------------------------------------------------------
# auto-dispatch
# ---------------------------------------------------------------------------


def test_load_params_auto_mixed_directory(tmp_path):
    """A directory holding a pyannote Lightning ckpt + a speechbrain ckpt
    loads both models — the exact drop-in a reference user would have."""
    rng = np.random.default_rng(6)
    seg_sd = make_pyannote_pyannet_state_dict(rng)
    emb_sd = make_speechbrain_ecapa_state_dict(rng)
    torch.save(
        {"state_dict": {k: torch.from_numpy(v.copy()) for k, v in seg_sd.items()}},
        str(tmp_path / "pytorch_model.bin"),
    )
    torch.save(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in emb_sd.items()},
        str(tmp_path / "embedding_model.ckpt"),
    )

    params = ingest.load_params_auto(str(tmp_path))
    assert set(params) == {"segmentation", "embedding"}
    _leaves_equal(params["segmentation"], convert.pyannet_from_pyannote(seg_sd))
    _leaves_equal(params["embedding"], convert.ecapa_from_speechbrain(emb_sd))


def test_load_params_auto_onnx_pair(tmp_path):
    rng = np.random.default_rng(7)
    seg_sd = make_pyannote_pyannet_state_dict(rng)
    emb_sd = make_speechbrain_ecapa_state_dict(rng)
    _write_segment_onnx(str(tmp_path / "segment2.onnx"), seg_sd, P.PyanNetConfig(), folded=False)
    inits = [
        _pb_tensor(f"embedding_model.{k}", np.asarray(v))
        for k, v in emb_sd.items()
        if not k.endswith("num_batches_tracked")
    ]
    with open(str(tmp_path / "emd4.onnx"), "wb") as f:
        f.write(_pb_model(inits, []))

    seg = ingest.load_params_auto(str(tmp_path / "segment2.onnx"))
    emb = ingest.load_params_auto(str(tmp_path / "emd4.onnx"))
    assert "segmentation" in seg and "embedding" in emb
    both = ingest.load_params_auto(str(tmp_path))
    assert set(both) == {"segmentation", "embedding"}


def test_load_params_auto_npz_dir_still_works(tmp_path):
    params = convert.random_params(0)
    convert.save_checkpoint(str(tmp_path), params)
    loaded = ingest.load_params_auto(str(tmp_path))
    _leaves_equal(params["segmentation"], loaded["segmentation"])
    _leaves_equal(params["embedding"], loaded["embedding"])


def test_load_pyannote_checkpoint_model_prefixed(tmp_path):
    """Some Lightning exports prefix every state-dict key with 'model.'
    (wrapper modules); the loader strips common prefixes."""
    rng = np.random.default_rng(8)
    sd_np = make_pyannote_pyannet_state_dict(rng)
    ckpt = {
        "state_dict": {
            f"model.{k}": torch.from_numpy(v.copy()) for k, v in sd_np.items()
        }
    }
    path = str(tmp_path / "wrapped.ckpt")
    torch.save(ckpt, path)
    params = ingest.load_pyannote_checkpoint(path)
    _leaves_equal(params, convert.pyannet_from_pyannote(sd_np))


def test_onnx_packed_fields_decode(tmp_path):
    """proto3 serializers (the real onnx library) emit repeated scalars
    PACKED (wire type 2); the hand-rolled decoder must handle both the
    packed and unpacked encodings of dims/float_data."""
    # packed dims: field 1, wire 2, payload = varints back to back
    dims_payload = _pb_varint(2) + _pb_varint(3)
    msg = _pb_field(1, 2, dims_payload)
    msg += _pb_field(2, 0, _pb_varint(1))  # FLOAT
    msg += _pb_field(8, 2, b"packed_w")
    vals = np.arange(6, dtype=np.float32)
    msg += _pb_field(4, 2, vals.tobytes())  # packed float_data
    model = _pb_model([msg], [])
    path = str(tmp_path / "packed.onnx")
    with open(path, "wb") as f:
        f.write(model)
    inits, nodes = ingest.read_onnx_model(path)
    np.testing.assert_array_equal(inits["packed_w"], vals.reshape(2, 3))

    # packed int64_data (field 7)
    msg2 = _pb_field(1, 2, _pb_varint(4))
    msg2 += _pb_field(2, 0, _pb_varint(7))  # INT64
    msg2 += _pb_field(8, 2, b"packed_i")
    msg2 += _pb_field(7, 2, b"".join(_pb_varint(v) for v in (7, 8, 9, 10)))
    with open(path, "wb") as f:
        f.write(_pb_model([msg2], []))
    inits, _ = ingest.read_onnx_model(path)
    np.testing.assert_array_equal(inits["packed_i"], np.array([7, 8, 9, 10]))


# ---------------------------------------------------------------------------
# security / robustness (ADVICE round 3)
# ---------------------------------------------------------------------------

PWNED = []


class _EvilReduce:
    """Pickles to a REDUCE of builtins.eval — the classic pickle-RCE shape a
    crafted third-party checkpoint would carry."""

    def __reduce__(self):
        return (eval, ("__import__('test_ingest').PWNED.append('rce')",))


def test_malicious_checkpoint_loads_inertly(tmp_path):
    """A checkpoint whose pickle resolves builtins.eval/exec/getattr must
    load WITHOUT executing anything: dangerous builtins become stubs, the
    tensors still come through."""
    sd = {"layer.weight": torch.randn(2, 2)}
    ckpt = {"state_dict": sd, "payload": _EvilReduce()}
    path = str(tmp_path / "evil.ckpt")
    torch.save(ckpt, path)

    PWNED.clear()
    loaded = ingest.read_torch_checkpoint(path)
    assert PWNED == []  # eval never ran
    assert isinstance(loaded["payload"], ingest._Stub)
    np.testing.assert_array_equal(
        loaded["state_dict"]["layer.weight"], sd["layer.weight"].numpy()
    )


def test_safe_builtins_still_resolve(tmp_path):
    """The data-container builtins (set/frozenset/complex/bytearray/slice)
    that real checkpoints legitimately reference keep loading as values."""
    ckpt = {
        "state_dict": {"w": torch.zeros(1)},
        "tags": {"a", "b"},
        "frozen": frozenset([1, 2]),
        "z": complex(1, 2),
        "buf": bytearray(b"xy"),
        "sl": slice(1, 5, 2),
    }
    path = str(tmp_path / "containers.ckpt")
    torch.save(ckpt, path)
    loaded = ingest.read_torch_checkpoint(path)
    assert loaded["tags"] == {"a", "b"}
    assert loaded["frozen"] == frozenset([1, 2])
    assert loaded["z"] == complex(1, 2)
    assert loaded["buf"] == bytearray(b"xy")
    assert loaded["sl"] == slice(1, 5, 2)


def test_onnx_negative_int64_data_field(tmp_path):
    """int64_data varints encode negatives as 64-bit two's complement; a
    Reshape shape of [-1, 192] in int64_data (not raw_data) must decode."""
    vals = [-1, 192, -(2**40)]
    msg = _pb_field(1, 0, _pb_varint(3))  # dims [3]
    msg += _pb_field(2, 0, _pb_varint(7))  # INT64
    msg += _pb_field(8, 2, b"shape")
    for v in vals:
        msg += _pb_field(7, 0, _pb_varint(v & 0xFFFFFFFFFFFFFFFF))
    name, arr = ingest._parse_tensor_proto(msg)
    assert name == "shape"
    np.testing.assert_array_equal(arr, np.asarray(vals, dtype=np.int64))


def test_pyannet_from_onnx_gemm_exported_linears(tmp_path):
    """Linear layers exported as single Gemm nodes (2-D inputs): the weight
    initializer is renamed and lives INSIDE the Gemm (no separate Add node
    to anchor on), the bias keeps its state-dict name as another Gemm
    input. Regression for the round-4 recovery fix (the Gemm search must
    run even when no Add node touches the bias)."""
    rng = np.random.default_rng(8)
    cfg = P.PyanNetConfig()
    sd = make_pyannote_pyannet_state_dict(rng, cfg)

    inits, nodes = [], []
    skip = set()
    for i in range(cfg.linear_layers):
        w = sd[f"linear.{i}.weight"]
        wname = f"onnx::Gemm_{100 + i}"
        inits.append(_pb_tensor(wname, np.asarray(w)))
        nodes.append(
            _pb_node(
                "Gemm",
                [f"/x_{i}", wname, f"linear.{i}.bias"],
                [f"/x_{i + 1}"],
                int_attrs={"transB": 1},
            )
        )
        skip.add(f"linear.{i}.weight")
    w = sd["classifier.weight"]
    inits.append(_pb_tensor("onnx::Gemm_199", np.asarray(w)))
    nodes.append(
        _pb_node(
            "Gemm",
            [f"/x_{cfg.linear_layers}", "onnx::Gemm_199", "classifier.bias"],
            ["/logits"],
            int_attrs={"transB": 1},
        )
    )
    skip.add("classifier.weight")
    for k, v in sd.items():
        if k not in skip:
            inits.append(_pb_tensor(k, np.asarray(v)))
    path = str(tmp_path / "gemm.onnx")
    with open(path, "wb") as f:
        f.write(_pb_model(inits, nodes))

    params = ingest.pyannet_from_onnx(path, cfg)
    ref = convert.pyannet_from_pyannote(sd, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pyannet_from_onnx_gemm_transb0(tmp_path):
    """Non-torch exporters may emit Gemm with transB=0 and the weight in
    (in, out) layout — the recovery must transpose instead of silently
    ingesting a transposed weight (round-4 advisor finding)."""
    rng = np.random.default_rng(9)
    cfg = P.PyanNetConfig()
    sd = make_pyannote_pyannet_state_dict(rng, cfg)

    inits, nodes = [], []
    skip = set()
    for i in range(cfg.linear_layers):
        w = sd[f"linear.{i}.weight"]
        wname = f"onnx::Gemm_{300 + i}"
        inits.append(_pb_tensor(wname, np.ascontiguousarray(np.asarray(w).T)))
        nodes.append(
            _pb_node(
                "Gemm",
                [f"/x_{i}", wname, f"linear.{i}.bias"],
                [f"/x_{i + 1}"],
                int_attrs={"transB": 0},
            )
        )
        skip.add(f"linear.{i}.weight")
    w = sd["classifier.weight"]
    inits.append(_pb_tensor("onnx::Gemm_399", np.ascontiguousarray(np.asarray(w).T)))
    nodes.append(
        _pb_node(
            "Gemm",
            [f"/x_{cfg.linear_layers}", "onnx::Gemm_399", "classifier.bias"],
            ["/logits"],
        )  # attribute OMITTED: the ONNX default is transB=0
    )
    skip.add("classifier.weight")
    for k, v in sd.items():
        if k not in skip:
            inits.append(_pb_tensor(k, np.asarray(v)))
    path = str(tmp_path / "gemm_tb0.onnx")
    with open(path, "wb") as f:
        f.write(_pb_model(inits, nodes))

    params = ingest.pyannet_from_onnx(path, cfg)
    ref = convert.pyannet_from_pyannote(sd, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
