"""Reference-side FULL-PIPELINE oracle ("the twin").

An end-to-end diarization implementation assembled from pieces the
framework's production code does not share:

  - the reference's OWN Python stage logic, loaded LIVE from
    ``/root/reference``: ``segment/segment.py`` (slide / binarize_swf /
    crop, :52-482), ``clustering/Clustering.py`` (filter / set_num /
    AHC-over-scipy / assign, :8-428), ``segment/utils.py`` (the vendored
    pyannote.core types);
  - torch models loaded DIRECTLY from published-layout state dicts
    (pyannote PyanNet / speechbrain ECAPA key layouts), including an
    independent torch transcription of the SincNet filter construction;
  - the torch STFT/fbank/normalization chain from
    tests/test_reference_oracles.py (torch.stft — the reference's own STFT
    backend, speakerDiarizer.cpp:2008 — plus independent speechbrain
    Filterbank/MyNormalization transcriptions);
  - fresh numpy transcriptions (in this file) of the components whose
    Python originals are not vendored: speaker_count (speakerDiarizer.cpp:
    1665-1738), aggregate (:1161-1313), reconstruct/to_diarization
    (:2563-2848) and to_annotation (:2852-2935).

``twin_diarize`` runs the whole pipeline and records the reference tensor
checklist (verifyEveryStepResult.py:5-17) so tests/test_e2e_twin.py can
compare it name-by-name against the production framework's dumps at the
reference tolerance policy. Nothing here imports from
``pyannote_audio_speaker_diarization_cpp_tpu`` except the model CONFIG
dataclasses (shape metadata, no math).
"""

from __future__ import annotations

import importlib.util
import math
import os
import random
import sys
import types
from typing import List, Optional, Tuple, Union

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE_DIR = "/root/reference"

# frontend transcriptions shared with the per-component oracle suite (torch
# code, independent of ops/frontend.py)
from test_reference_oracles import (  # noqa: E402
    _speechbrain_fbank_torch,
    _speechbrain_log_mel_torch,
)

# ---------------------------------------------------------------------------
# live reference modules
# ---------------------------------------------------------------------------

_cache = {}


def _exec_reference_file(relpath: str, inject: dict) -> dict:
    """Execute a reference python file with missing externals injected into
    its namespace (the files were copied out of pyannote and reference a few
    names their original package provided)."""
    path = os.path.join(REFERENCE_DIR, relpath)
    with open(path) as f:
        src = f.read()
    # whitespace repair (see ref_clustering docstring)
    src = src.replace('\n       """\n', '\n        """\n')
    ns = dict(inject)
    ns["__file__"] = path
    code = compile(src, path, "exec")
    exec(code, ns)
    return ns


def ref_utils():
    """segment/utils.py — the vendored pyannote.core, loaded live."""
    if "utils" not in _cache:
        path = os.path.join(REFERENCE_DIR, "segment/utils.py")
        spec = importlib.util.spec_from_file_location("twin_ref_utils", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["twin_ref_utils"] = mod
        spec.loader.exec_module(mod)
        mod.Segment.set_precision(None)
        _cache["utils"] = mod
    return _cache["utils"]


def ref_clustering():
    """clustering/Clustering.py, loaded live. The file was copied out of
    pyannote.pipeline: ``Pipeline``/``Uniform``/``Categorical``/``Integer``
    (hyper-parameter declarations), ``random``, ``typing`` names and the
    ``SlidingWindowFeature`` annotation are injected; the clustering math
    itself (scipy linkage/fcluster, centroid assignment) runs verbatim.

    One in-memory whitespace repair: the file's ``cluster`` docstring opens
    at 7 spaces while its body is at 8 (Clustering.py:285) — an
    IndentationError as shipped; the opening quote is re-indented before
    exec, changing no code."""
    if "clustering" not in _cache:

        class _Pipeline:
            def __init__(self, *a, **k):
                pass

        utils = ref_utils()
        ns = _exec_reference_file(
            "clustering/Clustering.py",
            {
                "Pipeline": _Pipeline,
                "Uniform": lambda *a, **k: None,
                "Categorical": lambda *a, **k: None,
                "Integer": lambda *a, **k: None,
                "random": random,
                "Tuple": Tuple,
                "Optional": Optional,
                "Union": Union,
                "List": List,
                "SlidingWindowFeature": utils.SlidingWindowFeature,
            },
        )
        _cache["clustering"] = ns
    return _cache["clustering"]


def ref_segmentation_ns():
    """segment/segment.py, loaded live. Its module-level imports
    (pyannote.audio Model, hf_token, torchaudio) exist only to build the
    HF-downloaded model in ``__init__``; the stage-logic methods touch none
    of them, so stubs suffice and ``Segmentation`` is instantiated without
    ``__init__`` (attributes set explicitly by the caller)."""
    if "segment" not in _cache:
        ref_utils()  # ensure twin_ref_utils is in sys.modules
        stubs = {}

        def stub_module(name, **attrs):
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            stubs[name] = m
            return m

        pa = stub_module("pyannote")
        paa = stub_module("pyannote.audio")
        pac = stub_module("pyannote.audio.core")
        pam = stub_module("pyannote.audio.core.model", Model=object)
        pa.audio = paa
        paa.core = pac
        pac.model = pam
        stub_module("hf_token", hf_auth_token=None)
        stub_module("torchaudio")
        # "from utils import ..." must resolve to the reference's vendored
        # pyannote.core, not anything on sys.path
        stubs["utils"] = sys.modules["twin_ref_utils"]

        saved = {k: sys.modules.get(k) for k in stubs}
        sys.modules.update(stubs)
        try:
            path = os.path.join(REFERENCE_DIR, "segment/segment.py")
            spec = importlib.util.spec_from_file_location("twin_ref_segment", path)
            mod = importlib.util.module_from_spec(spec)
            sys.modules["twin_ref_segment"] = mod
            spec.loader.exec_module(mod)
        finally:
            for k, v in saved.items():
                if v is None:
                    sys.modules.pop(k, None)
                else:
                    sys.modules[k] = v
        _cache["segment"] = mod
    return _cache["segment"]


# ---------------------------------------------------------------------------
# torch PyanNet from the pyannote state-dict layout
# ---------------------------------------------------------------------------


def _sinc_filters_torch(low_hz_, band_hz_, kernel_size, sample_rate,
                        min_low_hz=50.0, min_band_hz=50.0):
    """Independent torch transcription of the SincNet/ParamSincFB band-pass
    construction (Ravanelli & Bengio, as used by pyannote's SincNet):
    bandpass_left = (sin(2 pi f_hi n) - sin(2 pi f_lo n)) / (n/2) * hamming,
    center tap 2*band, right half mirrored, normalized by 2*band."""
    low = min_low_hz + torch.abs(low_hz_)
    high = torch.clamp(
        low + min_band_hz + torch.abs(band_hz_), min_low_hz, sample_rate / 2
    )
    band = (high - low)[:, 0]
    half = (kernel_size - 1) // 2
    n_ = (
        2
        * math.pi
        * torch.arange(-half, 0.0, dtype=low.dtype)[None, :]
        / sample_rate
    )
    n_lin = torch.linspace(0.0, kernel_size / 2 - 1, half, dtype=low.dtype)
    window = 0.54 - 0.46 * torch.cos(2 * math.pi * n_lin / kernel_size)
    f_low = low * n_
    f_high = high * n_
    left = ((torch.sin(f_high) - torch.sin(f_low)) / (n_ / 2)) * window[None, :]
    center = 2 * band[:, None]
    bp = torch.cat([left, center, torch.flip(left, dims=[1])], dim=1)
    bp = bp / (2 * band[:, None])
    return bp[:, None, :]


class TwinPyanNet(nn.Module):
    """pyannote/segmentation PyanNet, loaded straight from the published
    state-dict key layout (sincnet.* / lstm.* / linear.* / classifier.*) —
    no framework converter involved. Also carries the ``specifications`` /
    ``introspection`` attributes ``Segmentation.slide`` reads
    (segment/segment.py:74-76)."""

    def __init__(self, sd: dict, cfg):
        super().__init__()
        self.cfg = cfg

        def t(name):
            return torch.from_numpy(np.asarray(sd[name], dtype=np.float32))

        self.wav_norm = nn.InstanceNorm1d(1, affine=True)
        self.norms = nn.ModuleList(
            [
                nn.InstanceNorm1d(cfg.num_filters, affine=True),
                nn.InstanceNorm1d(cfg.conv_channels, affine=True),
                nn.InstanceNorm1d(cfg.conv_channels, affine=True),
            ]
        )
        self.conv1 = nn.Conv1d(cfg.num_filters, cfg.conv_channels, 5)
        self.conv2 = nn.Conv1d(cfg.conv_channels, cfg.conv_channels, 5)
        with torch.no_grad():
            self.wav_norm.weight.copy_(t("sincnet.wav_norm1d.weight"))
            self.wav_norm.bias.copy_(t("sincnet.wav_norm1d.bias"))
            for i, norm in enumerate(self.norms):
                norm.weight.copy_(t(f"sincnet.norm1d.{i}.weight"))
                norm.bias.copy_(t(f"sincnet.norm1d.{i}.bias"))
            self.conv1.weight.copy_(t("sincnet.conv1d.1.weight"))
            self.conv1.bias.copy_(t("sincnet.conv1d.1.bias"))
            self.conv2.weight.copy_(t("sincnet.conv1d.2.weight"))
            self.conv2.bias.copy_(t("sincnet.conv1d.2.bias"))
        self.filters = _sinc_filters_torch(
            t("sincnet.conv1d.0.low_hz_"),
            t("sincnet.conv1d.0.band_hz_"),
            cfg.kernel_size,
            cfg.sample_rate,
            cfg.min_low_hz,
            cfg.min_band_hz,
        )
        self.lstm = nn.LSTM(
            cfg.conv_channels,
            cfg.lstm_hidden,
            num_layers=cfg.lstm_layers,
            bidirectional=True,
            batch_first=True,
        )
        lstm_sd = {
            k[len("lstm."):]: torch.from_numpy(np.asarray(v))
            for k, v in sd.items()
            if k.startswith("lstm.")
        }
        self.lstm.load_state_dict(lstm_sd)
        self.linears = nn.ModuleList()
        i = 0
        while f"linear.{i}.weight" in sd:
            w = t(f"linear.{i}.weight")
            lin = nn.Linear(w.shape[1], w.shape[0])
            with torch.no_grad():
                lin.weight.copy_(w)
                lin.bias.copy_(t(f"linear.{i}.bias"))
            self.linears.append(lin)
            i += 1
        w = t("classifier.weight")
        self.classifier = nn.Linear(w.shape[1], w.shape[0])
        with torch.no_grad():
            self.classifier.weight.copy_(w)
            self.classifier.bias.copy_(t("classifier.bias"))
        self.eval()

        # what Segmentation.slide reads (segment/segment.py:74-76)
        self.specifications = types.SimpleNamespace(duration=5.0)
        self.introspection = lambda n: (self.num_frames(n), cfg.num_classes)

    def num_frames(self, n: int) -> int:
        n = (n - self.cfg.kernel_size) // self.cfg.stride + 1
        n = n // 3
        for _ in range(2):
            n = (n - 5) + 1
            n = n // 3
        return n

    def forward(self, chunks: torch.Tensor) -> torch.Tensor:
        # chunks: (B, 1, N)
        out = self.wav_norm(chunks)
        out = F.conv1d(out, self.filters, stride=self.cfg.stride)
        out = torch.abs(out)
        out = F.leaky_relu(self.norms[0](F.max_pool1d(out, 3, 3)), 0.01)
        out = F.leaky_relu(self.norms[1](F.max_pool1d(self.conv1(out), 3, 3)), 0.01)
        out = F.leaky_relu(self.norms[2](F.max_pool1d(self.conv2(out), 3, 3)), 0.01)
        out, _ = self.lstm(out.transpose(1, 2))
        for lin in self.linears:
            out = F.leaky_relu(lin(out), 0.01)
        return torch.sigmoid(self.classifier(out))


# ---------------------------------------------------------------------------
# torch ECAPA from the speechbrain state-dict layout
# ---------------------------------------------------------------------------


def build_twin_ecapa(sd: dict, cfg):
    """tests/test_models.TorchEcapa (speechbrain-topology torch mirror)
    loaded straight from the speechbrain key layout — the framework
    converter is NOT used."""
    from test_models import TorchEcapa

    tm = TorchEcapa(cfg).eval()

    def t(name):
        return torch.from_numpy(np.asarray(sd[name], dtype=np.float32))

    def load_conv(conv, prefix):
        with torch.no_grad():
            conv.weight.copy_(t(prefix + ".weight"))
            conv.bias.copy_(t(prefix + ".bias"))

    def load_bn(bn, prefix):
        with torch.no_grad():
            bn.weight.copy_(t(prefix + ".weight"))
            bn.bias.copy_(t(prefix + ".bias"))
            bn.running_mean.copy_(t(prefix + ".running_mean"))
            bn.running_var.copy_(t(prefix + ".running_var"))

    def load_tdnn(tdnn, prefix):
        load_conv(tdnn.conv, prefix + ".conv.conv")
        load_bn(tdnn.bn, prefix + ".norm.norm")

    load_tdnn(tm.block0, "blocks.0")
    for i, blk in enumerate((tm.b1, tm.b2, tm.b3), start=1):
        load_tdnn(blk.tdnn1, f"blocks.{i}.tdnn1")
        for j, sub in enumerate(blk.blocks):
            load_tdnn(sub, f"blocks.{i}.res2net_block.blocks.{j}")
        load_tdnn(blk.tdnn2, f"blocks.{i}.tdnn2")
        load_conv(blk.se1, f"blocks.{i}.se_block.conv1.conv")
        load_conv(blk.se2, f"blocks.{i}.se_block.conv2.conv")
    load_tdnn(tm.mfa, "mfa")
    load_tdnn(tm.asp_tdnn, "asp.tdnn")
    load_conv(tm.asp_conv, "asp.conv.conv")
    load_bn(tm.asp_bn, "asp_bn.norm")
    load_conv(tm.fc, "fc.conv")
    return tm


def twin_embedding_forward(tm, signals: torch.Tensor, wav_lens: torch.Tensor, fcfg):
    """waveform signals -> 192-d embeddings: torch.stft + independent
    Filterbank/log-mel/MyNormalization transcriptions + the torch ECAPA
    mirror (the chain the reference exports as emd4.onnx plus its libtorch
    STFT front half, embeddings/threeModel.py:7-396)."""
    win = torch.hamming_window(fcfg.win_length, periodic=True, dtype=torch.float64)
    stft = torch.stft(
        signals.double(),
        fcfg.n_fft,
        fcfg.hop_length,
        fcfg.win_length,
        win,
        center=True,
        pad_mode="constant",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    power = (stft.real**2 + stft.imag**2).transpose(1, 2)
    fbank = _speechbrain_fbank_torch(
        fcfg.n_mels, fcfg.f_min, fcfg.f_max, fcfg.n_fft, fcfg.sample_rate
    )
    feats = _speechbrain_log_mel_torch(
        power, fbank, fcfg.amin, fcfg.ref_value, fcfg.top_db
    )
    T = feats.shape[1]
    actual = torch.round(wav_lens.double() * T)
    idx = torch.arange(T)[None, :, None]
    valid = (idx < actual[:, None, None]).double()
    mean = (feats * valid).sum(1, keepdim=True) / valid.sum(1, keepdim=True)
    feats = (feats - mean).float()
    with torch.no_grad():
        return tm(feats, wav_lens.float()).numpy()


# ---------------------------------------------------------------------------
# fresh numpy transcriptions: aggregate / count / reconstruct / decode
# (Python originals not vendored; semantics from the C++,
#  speakerDiarizer.cpp:1161-1313, :1665-1738, :2563-2935)
# ---------------------------------------------------------------------------


def twin_aggregate(scores, chunk_window, frames_window, skip_average, dump=None):
    """pyannote Inference.aggregate (PipelineHelper::aggregate,
    speakerDiarizer.cpp:1161-1313): scatter each chunk's frames onto the
    global grid at closest_frame(chunk start), sum value*mask and mask
    counts, divide unless skip_average, missing -> 0."""
    utils = ref_utils()
    num_chunks, chunk_frames, K = scores.shape
    grid = utils.SlidingWindow(
        start=chunk_window.start,
        step=frames_window.step,
        duration=frames_window.duration,
    )
    target = chunk_window.start + chunk_window.duration + (
        num_chunks - 1
    ) * chunk_window.step
    num_frames = grid.closest_frame(target) + 1
    masks = (~np.isnan(scores)).astype(np.float64)
    clean = np.nan_to_num(scores).astype(np.float64)
    agg = np.zeros((num_frames, K))
    overlap = np.zeros((num_frames, K))
    for c in range(num_chunks):
        start = grid.closest_frame(chunk_window.start + c * chunk_window.step)
        lo, hi = max(0, start), min(num_frames, start + chunk_frames)
        src = slice(lo - start, hi - start)
        agg[lo:hi] += clean[c, src] * masks[c, src]
        overlap[lo:hi] += masks[c, src]
    if dump is not None:
        dump.dump("scores_in_aggregate", clean.astype(np.float32))
        dump.dump("masks_in_aggregate", masks.astype(np.float32))
    out = agg if skip_average else agg / np.maximum(overlap, np.finfo(float).eps)
    out = np.where(overlap == 0, 0.0, out)
    if dump is not None:
        dump.dump("aggregated_output", out.astype(np.float32))
        dump.dump("aggregated_mask", (overlap > 0).astype(np.float32))
        dump.dump("overlapping_chunk_count", overlap.astype(np.float32))
    return out, grid, num_frames


def twin_speaker_count(binarized, chunk_window, frame_step, warm_up, dump=None):
    """speaker_count (speakerDiarizer.cpp:1665-1738): trim warm-up, sum
    over speakers, overlap-add AVERAGE, banker's rint."""
    utils = ref_utils()
    num_chunks, num_frames, _ = binarized.shape
    n_left = math.floor(num_frames * warm_up[0])
    n_right = math.floor(num_frames * warm_up[1])
    trimmed = binarized[:, n_left : num_frames - n_right, :]
    if dump is not None:
        dump.dump("trimmed", trimmed.astype(np.float32))
    summed = trimmed.sum(axis=-1, keepdims=True)
    if dump is not None:
        dump.dump("sum_trimmed", summed[:, :, 0].astype(np.float32))
    trimmed_window = utils.SlidingWindow(
        start=chunk_window.start + warm_up[0] * chunk_window.duration,
        step=chunk_window.step,
        duration=(1 - warm_up[0] - warm_up[1]) * chunk_window.duration,
    )
    frames_window = utils.SlidingWindow(start=0.0, step=frame_step, duration=frame_step)
    data, grid, num_out = twin_aggregate(
        summed, trimmed_window, frames_window, skip_average=False
    )
    if dump is not None:
        dump.dump("count_data", data[:, 0])
    count = np.rint(data[:, 0]).astype(np.int64)
    if dump is not None:
        dump.dump("count", count)
    return count, grid, num_out


def twin_reconstruct_decode(
    segmentations,
    chunk_window,
    hard_clusters,
    count,
    count_grid,
    count_len,
    frame_step,
    onset,
    offset,
    min_duration_on,
    min_duration_off,
    dump=None,
):
    """reconstruct + to_diarization + to_annotation
    (speakerDiarizer.cpp:2563-2935). Returns [(start, end, label)] turns."""
    utils = ref_utils()
    num_chunks, num_frames, _ = segmentations.shape
    num_clusters = int(np.max(hard_clusters)) + 1

    clustered = np.full((num_chunks, num_frames, num_clusters), np.nan)
    for c in range(num_chunks):
        for k in range(num_clusters):
            members = np.flatnonzero(hard_clusters[c] == k)
            if members.size:
                clustered[c, :, k] = segmentations[c][:, members].max(axis=1)
    if dump is not None:
        dump.dump("clustered_segmentations", clustered)

    frames_window = utils.SlidingWindow(start=0.0, step=frame_step, duration=frame_step)
    activations, act_grid, act_len = twin_aggregate(
        clustered, chunk_window, frames_window, skip_average=True, dump=dump
    )
    if dump is not None:
        dump.dump("to_diarization_activations", activations.astype(np.float32))

    # crop to the activations-extent intersect count-extent
    # (to_diarization, speakerDiarizer.cpp:2688-2714; extent formula and
    # crop_segment index math transcribed verbatim)
    count = np.minimum(count, num_clusters)

    def extent(grid, n):
        t = grid.start + (0 - 0.5) * grid.step + 0.5 * grid.duration
        return grid.start, t + n * grid.step

    a0, a1 = extent(act_grid, len(activations))
    c0, c1 = extent(count_grid, len(count))
    focus_start, focus_end = max(a0, c0), min(a1, c1)

    def crop(data, grid):
        # crop_segment (speakerDiarizer.cpp:2567-2635)
        n = len(data)
        i_ = (focus_start - grid.duration - grid.start) / grid.step
        lo = max(0, math.ceil(i_))
        j_ = (focus_end - grid.start) / grid.step
        hi = min(n, math.floor(j_) + 1)
        sub_grid = utils.SlidingWindow(
            start=grid.start + lo * grid.step, step=grid.step, duration=grid.duration
        )
        return data[lo:hi], sub_grid

    cropped_act, binary_grid = crop(activations, act_grid)
    cropped_count, _ = crop(count[:, None], count_grid)
    cropped_count = cropped_count[:, 0]
    if dump is not None:
        dump.dump("cropped_activations", cropped_act.astype(np.float32))
        dump.dump("cropped_count", cropped_count)

    order = np.argsort(-cropped_act, axis=-1, kind="stable")
    if dump is not None:
        dump.dump("sorted_speakers", order)
    n = min(len(cropped_count), len(cropped_act))
    binary = np.zeros_like(cropped_act)
    for f in range(n):
        for r in range(int(cropped_count[f])):
            binary[f, order[f, r]] = 1.0
    if dump is not None:
        dump.dump("discrete_diarization", binary.astype(np.float32))

    # to_annotation (speakerDiarizer.cpp:2852-2935): per-class hysteresis
    # over frame-middle timestamps, gap-fill, short-turn removal
    timestamps = [
        binary_grid[f].start + 0.5 * binary_grid.duration for f in range(len(binary))
    ]
    turns = []
    for k in range(num_clusters):
        line = binary[:, k]
        start = timestamps[0]
        active = line[0] > onset
        for t in range(1, len(line)):
            if active and line[t] < offset:
                turns.append([start, timestamps[t], k])
                active = False
            elif not active and line[t] > onset:
                start = timestamps[t]
                active = True
        if active:
            turns.append([start, timestamps[-1], k])

    # support(min_duration_off): merge same-label turns whose gap is below
    # the collar (Annotation::support, speakerDiarizer.cpp:1018/911), then
    # removeShort(min_duration_on) (:1009; min_duration_on = 0 keeps all)
    final = []
    for k in range(num_clusters):
        k_turns = sorted([t0, t1] for t0, t1, kk in turns if kk == k)
        cur = None
        for t0, t1 in k_turns:
            if cur is not None and t0 - cur[1] < min_duration_off:
                cur[1] = max(cur[1], t1)
            else:
                if cur is not None:
                    final.append((cur[0], cur[1], k))
                cur = [t0, t1]
        if cur is not None:
            final.append((cur[0], cur[1], k))
    if min_duration_on > 0.0:
        final = [t for t in final if (t[1] - t[0]) >= min_duration_on]
    final.sort()
    return final


def twin_mask_choice(seg, wav_t, binary_data, clean_data, chunk_window, min_num_frames):
    """Per-(chunk, speaker) mask choice + LIVE reference crop — the loop of
    Segmentation.run (segment/segment.py:188-216) driven to completion."""
    utils = ref_utils()
    num_chunks = binary_data.shape[0]
    duration = chunk_window.duration
    all_masks, all_waves = [], []
    for c in range(num_chunks):
        chunk_seg = utils.Segment(
            chunk_window.start + c * chunk_window.step,
            chunk_window.start + c * chunk_window.step + duration,
        )
        wvform, _ = seg.crop(wav_t, 16000, chunk_seg, duration=duration, mode="pad")
        masks = np.nan_to_num(binary_data[c], nan=0.0).astype(np.float32)
        clean_masks = np.nan_to_num(clean_data[c], nan=0.0).astype(np.float32)
        for mask, clean_mask in zip(masks.T, clean_masks.T):
            used = clean_mask if np.sum(clean_mask) > min_num_frames else mask
            all_masks.append(used)
            all_waves.append(wvform[0])
    return all_masks, all_waves


def twin_embeddings(seg, ecapa, all_masks, all_waves, ecapa_cfg, frontend_cfg, dump=None, forward=True):
    """embedding_mask preprocessing (F.interpolate + pad_sequence +
    wav_lens, segment/segment.py:283-304; window-normalized lengths — the
    framework's documented deviation 2, docs/PARITY.md) + the torch
    embedding chain. Returns (rows, emb_dim) float64 with NaN rows for
    too-short masks."""
    embeddings = np.zeros((len(all_masks), ecapa_cfg.emb_dim), np.float64)
    all_imasks, all_signals, all_lens, all_final_lens = [], [], [], []
    B = seg.embedding_batch_size
    window = all_waves[0].shape[0]
    for lo in range(0, len(all_masks), B):
        masks_b = torch.from_numpy(np.stack(all_masks[lo : lo + B]))
        waves_b = torch.stack(all_waves[lo : lo + B])
        n = waves_b.shape[1]
        imasks = F.interpolate(
            masks_b.unsqueeze(1), size=n, mode="nearest"
        ).squeeze(1)
        imasks = imasks > 0.5
        signals = torch.nn.utils.rnn.pad_sequence(
            [w[m] for w, m in zip(waves_b, imasks)], batch_first=True
        )
        if signals.shape[1] < n:
            signals = F.pad(signals, (0, n - signals.shape[1]))
        wav_lens = imasks.sum(dim=1)
        all_imasks.append(imasks.numpy())
        all_lens.append(wav_lens.numpy())
        too_short = (wav_lens < seg.min_num_samples).numpy()
        max_len = wav_lens.max()
        if float(max_len) < seg.min_num_samples:
            embeddings[lo : lo + masks_b.shape[0]] = np.nan
            all_signals.append(signals.numpy())
            all_final_lens.append(np.ones(masks_b.shape[0], np.float64))
            continue
        lens_rel = wav_lens.double() / n  # window-normalized (deviation 2)
        lens_rel[torch.from_numpy(too_short)] = 1.0
        all_signals.append(signals.numpy())
        all_final_lens.append(lens_rel.numpy())
        if not forward:  # preprocessing-only mode (stage-isolated tests)
            continue
        emb = twin_embedding_forward(ecapa, signals, lens_rel, frontend_cfg)
        emb = emb.astype(np.float64)
        emb[too_short] = np.nan
        embeddings[lo : lo + masks_b.shape[0]] = emb
    if dump is not None:
        dump.dump("imasks", np.concatenate(all_imasks))
        sig = np.concatenate(
            [np.pad(s, ((0, 0), (0, window - s.shape[1]))) for s in all_signals]
        )
        dump.dump("signals", sig)
        dump.dump("wav_lens", np.concatenate(all_lens))
        dump.dump("final_wav_lens", np.concatenate(all_final_lens))
    return embeddings


def twin_cluster(embeddings, num_speakers=None, dump=None):
    """LIVE reference AgglomerativeClustering (clustering/Clustering.py)
    with the recipe hyper-parameters, plus the clustering-internal dumps
    (filtered/norm/dist/clusterRes/clusters) recomputed with scipy
    alongside."""
    clu_ns = ref_clustering()
    clu = clu_ns["AgglomerativeClustering"].__new__(
        clu_ns["AgglomerativeClustering"]
    )
    clu.metric = "cosine"
    clu.max_num_embeddings = np.inf
    clu.constrained_assignment = False
    clu.threshold = 0.7153814381597874
    clu.method = "centroid"
    clu.min_cluster_size = 15
    if dump is not None:
        from scipy.cluster.hierarchy import linkage as scipy_linkage
        from scipy.spatial.distance import pdist

        chunk_idx, speaker_idx = np.where(~np.any(np.isnan(embeddings), axis=2))
        train = embeddings[chunk_idx, speaker_idx]
        dump.dump("filtered_embeddings", train)
        if train.shape[0] >= 2:
            with np.errstate(divide="ignore", invalid="ignore"):
                norm = train / np.linalg.norm(train, axis=-1, keepdims=True)
            dump.dump("norm_embeddings", norm)
            dump.dump("dist", pdist(norm))
            Z = scipy_linkage(norm, method="centroid", metric="euclidean")
            dump.dump("clusterRes", Z)
            nc, mnc, mxc = clu.set_num_clusters(train.shape[0])
            train_clusters = clu.cluster(
                train.copy(), mnc, mxc, num_clusters=num_speakers or nc
            )
            dump.dump("clusters", np.asarray(train_clusters))
    hard, soft = clu(embeddings, num_clusters=num_speakers)
    return np.asarray(hard, dtype=np.int64), np.asarray(soft)


# ---------------------------------------------------------------------------
# the full twin pipeline
# ---------------------------------------------------------------------------


def make_segmentation(model: TwinPyanNet):
    """A live reference ``Segmentation`` instance without its HF-loading
    ``__init__`` (segment/segment.py:22-48 attribute-for-attribute)."""
    mod = ref_segmentation_ns()
    seg = mod.Segmentation.__new__(mod.Segmentation)
    seg.duration = 5.0
    seg.step = 0.5
    seg.batch_size = 32
    seg.sample_rate = 16000
    seg.embedding_batch_size = 32
    seg.min_num_samples = 640
    seg.model = model
    seg.device = torch.device("cpu")
    seg.diarization_segmentation_threashold = 0.4442333667381752
    seg.diarization_segmentation_min_duration_off = 0.5817029604921046
    seg.dimension = 192
    return seg


def twin_diarize(
    waveform: np.ndarray,
    seg_sd: dict,
    emb_sd: dict,
    pyannet_cfg,
    ecapa_cfg,
    frontend_cfg,
    dump=None,
    num_speakers=None,
):
    """The complete reference-side pipeline on ``waveform`` (float32 mono
    16 kHz). Returns (turns [(start, end, label)], dumps recorded into
    ``dump`` when given)."""
    seg_model = TwinPyanNet(seg_sd, pyannet_cfg)
    ecapa = build_twin_ecapa(emb_sd, ecapa_cfg)
    seg = make_segmentation(seg_model)

    wav_t = torch.from_numpy(waveform)[None, :]  # (1, N)

    # ---- stage 1: slide + binarize (LIVE reference code) ----
    segmentations = seg.slide(wav_t, 16000)
    if dump is not None:
        dump.dump("segmentations", segmentations.data)
    binary = seg.binarize_swf(
        segmentations,
        onset=seg.diarization_segmentation_threashold,
        initial_state=False,
    )
    if dump is not None:
        dump.dump("binarized_segmentations", binary.data.astype(np.float32))

    chunk_window = segmentations.sliding_window  # start 0, dur 5, step 0.5
    frame_step = 0.016875  # speakerDiarizer.cpp:2430-2432

    count, count_grid, count_len = twin_speaker_count(
        binary.data, chunk_window, frame_step, (0.1, 0.1), dump=dump
    )

    # ---- stage 2: masks + crop + embeddings ----
    # the loop is Segmentation.run's own iteration (segment/segment.py:
    # 170-245) driven to completion: clean frames, per-speaker mask choice,
    # LIVE crop(), then the embedding_mask preprocessing (F.interpolate +
    # pad_sequence + wav_lens, :283-304) and the torch embedding chain.
    duration = binary.sliding_window.duration
    num_chunks, num_frames, local_speakers = binary.data.shape
    num_samples_chunk = duration * 16000
    min_num_frames = math.ceil(num_frames * seg.min_num_samples / num_samples_chunk)
    clean_frames = 1.0 * (np.sum(binary.data, axis=2, keepdims=True) < 2)
    clean_data = binary.data * clean_frames
    if dump is not None:
        dump.dump("clean_segmentations", clean_data.astype(np.float32))

    all_masks, all_waves = twin_mask_choice(
        seg, wav_t, binary.data, clean_data, chunk_window, min_num_frames
    )
    if dump is not None:
        dump.dump("masks", np.stack(all_masks))
        dump.dump("batch_masks", np.stack(all_masks))

    embeddings = twin_embeddings(
        seg, ecapa, all_masks, all_waves, ecapa_cfg, frontend_cfg, dump=dump
    )
    embeddings = embeddings.reshape(num_chunks, local_speakers, -1)
    if dump is not None:
        dump.dump("embeddings", embeddings)

    # ---- stage 3: LIVE reference clustering ----
    hard, soft = twin_cluster(embeddings, num_speakers=num_speakers, dump=dump)
    if dump is not None:
        dump.dump("soft_clusters", soft)
    # inactive local speakers -> -2 (speakerDiarizer.cpp:3166-3191)
    inactive = binary.data.sum(axis=1) == 0
    hard[inactive] = -2
    if dump is not None:
        dump.dump("hard_clusters", hard)

    # ---- reconstruction + decode (fresh transcription) ----
    turns = twin_reconstruct_decode(
        segmentations.data,
        chunk_window,
        hard,
        count,
        count_grid,
        count_len,
        frame_step,
        onset=0.5,
        offset=0.5,
        min_duration_on=0.0,
        min_duration_off=seg.diarization_segmentation_min_duration_off,
        dump=dump,
    )
    return turns
