"""Forward passes of the model zoo — pure, jittable, batched.

Graph definitions follow ref src/networks.c (line refs inline).  All
functions take a parameter pytree (dict of arrays, see registry.py) and
time-major batched features, and return per-block outputs:

  raw/rgrgr/events -> posterior probabilities [B, nblock, 1025]
  rnnrf            -> CRF transition weights  [B, nblock, 25] (log-space)
  squiggle         -> per-base (current, log sd, -log dwell) [B, N, 3]

Unlike the reference (one read per call, columns-as-time), a batch of
chunks flows through together so the GEMMs are MXU-sized.
"""

from __future__ import annotations

import jax.numpy as jnp

from scrappie_tpu.models.specs import GRU_DIRS
from scrappie_tpu.nn.layers import (
    conv1d,
    elu,
    embedding,
    feedforward,
    feedforward2_tanh,
    globalnorm,
    robustlog,
    softmax_with_temperature,
    window,
)
from scrappie_tpu.nn.rnn import gru, lstm
from scrappie_tpu.utils.validate import checked

_CONV_ACT = {"elu": elu, "tanh": jnp.tanh}


def rgrgr_posterior(params, sig, *, conv_activation="elu", stride=5,
                    min_prob=1e-5, tempW=1.0, tempb=1.0, return_log=True):
    """rgrgr_{r94,r941,r10}: conv -> 5 alternating single-direction GRUs
    -> softmax with temperature (ref src/networks.c:250-394).

    On TPU the GRU stack runs through the Pallas scan kernel (time-major
    internally); off-TPU (and under `ops.pallas(False)`, e.g. for
    training, which needs a VJP) it is the pure lax.scan program.
    """
    from scrappie_tpu import ops

    if ops.pallas_enabled():
        lp = rgrgr_posterior_tm(params, sig, conv_activation=conv_activation,
                                stride=stride, min_prob=min_prob, tempW=tempW,
                                tempb=tempb, return_log=return_log)
        return jnp.moveaxis(lp, 0, 1)
    x = conv1d(sig, params["conv_W"], params["conv_b"], int(stride))
    x = checked(_CONV_ACT[conv_activation](x), "rgrgr.conv")
    for i, d in enumerate(GRU_DIRS, start=1):
        pre = f"gru{d.upper()}{i}"
        xin = feedforward(x, params[f"{pre}_iW"], params[f"{pre}_b"])
        x = gru(xin, params[f"{pre}_sW"], params[f"{pre}_sW2"], reverse=(d == "b"))
        x = checked(x, f"rgrgr.{pre}", lo=-1.0, hi=1.0)
    post = softmax_with_temperature(x, params["FF_W"], params["FF_b"], tempW, tempb)
    post = checked(post, "rgrgr.softmax", lo=0.0, hi=1.0)
    return robustlog(post, min_prob) if return_log else post


def rgrgr_posterior_tm(params, sig, *, conv_activation="elu", stride=5,
                       min_prob=1e-5, tempW=1.0, tempb=1.0, return_log=True):
    """Time-major Pallas variant of rgrgr_posterior: sig [B, T, 1] ->
    log posterior [nblock, B, nstate].

    Keeping the whole stack time-major means one cheap transpose right
    after the conv (where the tensor is smallest) and none between the
    five GRU layers or before the Viterbi kernel, which also consumes
    time-major blocks.  Hidden lanes stay 128-padded through the stack
    (pad lanes are exactly zero, see ops/gru.py).
    """
    from scrappie_tpu.ops.gru import gru_layer_tm

    B = sig.shape[0]
    pad = (-B) % 8
    if pad:
        sig = jnp.pad(sig, ((0, pad), (0, 0), (0, 0)))
    x = conv1d(sig, params["conv_W"], params["conv_b"], int(stride))
    x = _CONV_ACT[conv_activation](x)
    x = jnp.moveaxis(x, 0, 1)  # [nblock, B, C]
    for i, d in enumerate(GRU_DIRS, start=1):
        pre = f"gru{d.upper()}{i}"
        x = gru_layer_tm(x, params[f"{pre}_iW"], params[f"{pre}_b"],
                         params[f"{pre}_sW"], params[f"{pre}_sW2"],
                         reverse=(d == "b"))
    W = params["FF_W"]
    Wp = jnp.pad(W, ((0, x.shape[-1] - W.shape[0]), (0, 0)))
    post = softmax_with_temperature(x, Wp, params["FF_b"], tempW, tempb)
    if pad:
        post = post[:, :B]
    post = checked(post, "rgrgr_tm.softmax", lo=0.0, hi=1.0)
    return robustlog(post, min_prob) if return_log else post


def rnnrf_transitions(params, sig, *, conv_activation="elu", stride=2,
                      min_prob=1e-5, tempW=1.0, tempb=1.0, return_log=True):
    """rnnrf_r94: conv -> 5 residual GRUs -> globally-normalised CRF
    transitions (ref src/networks.c:567-615).  Always log-space.

    On TPU the residual GRU stack runs through the Pallas scan kernel
    (time-major internally, like rgrgr_posterior); off-TPU (and under
    `ops.pallas(False)`, e.g. for training) it is the lax.scan program.
    """
    del min_prob, tempW, tempb
    assert return_log, "rnnrf transitions are always log-space"
    from scrappie_tpu import ops

    if ops.pallas_enabled():
        return rnnrf_transitions_tm(params, sig,
                                    conv_activation=conv_activation,
                                    stride=stride)
    x = rnnrf_features(params, sig, conv_activation=conv_activation,
                       stride=stride)
    return checked(globalnorm(x, params["FF_W"], params["FF_b"]),
                   "rnnrf.globalnorm")


def rnnrf_features(params, sig, *, conv_activation="elu", stride=2):
    """Pre-head features of the rnnrf stack: conv -> 5 residual GRUs,
    [B, nblock, 96] (everything of rnnrf_transitions except the
    globalnorm CRF head; ref src/networks.c:567-607).  Used to train the
    transition head alone on precomputed features (train/wholeread.py)."""
    x = conv1d(sig, params["conv_W"], params["conv_b"], int(stride))
    x = _CONV_ACT[conv_activation](x)
    for i, d in enumerate(GRU_DIRS, start=1):
        pre = f"gru{d.upper()}{i}"
        xin = feedforward(x, params[f"{pre}_iW"], params[f"{pre}_b"])
        gx = gru(xin, params[f"{pre}_sW"], params[f"{pre}_sW2"], reverse=(d == "b"))
        x = checked(x + gx, f"rnnrf.res_{pre}")  # residual (ref :583-607)
    return x


def rnnrf_transitions_tm(params, sig, *, conv_activation="elu", stride=2,
                         prec_name=None):
    """Time-major Pallas variant of rnnrf_transitions: sig [B, T, 1] ->
    CRF transitions [B, nblock, 25].

    Same layout strategy as rgrgr_posterior_tm: one transpose after the
    conv, then the five residual GRU layers stay time-major with hidden
    lanes 128-padded (pad lanes exactly zero in both the running feature
    tensor and the kernel output, so the residual adds preserve the
    zero-pad invariant the layer chaining relies on).  The globalnorm
    head is a uniform per-read shift of every transition energy, so the
    decoded Viterbi path is unchanged by where it is applied.
    """
    from scrappie_tpu.ops.gru import gru_layer_tm

    B = sig.shape[0]
    bpad = (-B) % 8
    if bpad:
        sig = jnp.pad(sig, ((0, bpad), (0, 0), (0, 0)))
    x = conv1d(sig, params["conv_W"], params["conv_b"], int(stride))
    x = _CONV_ACT[conv_activation](x)
    x = jnp.moveaxis(x, 0, 1)  # [nblock, B, S]
    S = x.shape[-1]
    lane_pad = (-S) % 128
    if lane_pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, lane_pad)))
    for i, d in enumerate(GRU_DIRS, start=1):
        pre = f"gru{d.upper()}{i}"
        gx = gru_layer_tm(x, params[f"{pre}_iW"], params[f"{pre}_b"],
                          params[f"{pre}_sW"], params[f"{pre}_sW2"],
                          reverse=(d == "b"), prec_name=prec_name)
        # residual (ref src/networks.c:583-607); per-layer checked() so
        # SCRAPPIE_TPU_VALIDATE attributes a mid-stack NaN to the
        # offending kernel, matching the batch-major path's attribution
        x = checked(x + gx, f"rnnrf_tm.res_{pre}")
    x = jnp.moveaxis(x, 0, 1)  # [B, nblock, Sp]
    W = params["FF_W"]
    Wp = jnp.pad(W, ((0, x.shape[-1] - W.shape[0]), (0, 0)))
    trans = globalnorm(x, Wp, params["FF_b"])
    if bpad:
        trans = trans[:B]
    return checked(trans, "rnnrf_tm.globalnorm")


def raw_posterior(params, sig, *, stride=4, min_prob=1e-5,
                  tempW=1.0, tempb=1.0, return_log=True):
    """raw_r94: conv+tanh -> 2x (biGRU + FF2-tanh) -> softmax_temp
    (ref src/networks.c:196-247).  Dispatches to the Pallas GRU kernels
    on TPU (see rgrgr_posterior)."""
    from scrappie_tpu import ops

    if ops.pallas_enabled():
        lp = raw_posterior_tm(params, sig, stride=stride, min_prob=min_prob,
                              tempW=tempW, tempb=tempb, return_log=return_log)
        return jnp.moveaxis(lp, 0, 1)
    x = checked(jnp.tanh(conv1d(sig, params["conv_W"], params["conv_b"],
                                int(stride))), "raw.conv", lo=-1.0, hi=1.0)
    for layer in (1, 2):
        xf = feedforward(x, params[f"gruF{layer}_iW"], params[f"gruF{layer}_b"])
        xb = feedforward(x, params[f"gruB{layer}_iW"], params[f"gruB{layer}_b"])
        hf = gru(xf, params[f"gruF{layer}_sW"], params[f"gruF{layer}_sW2"])
        hb = gru(xb, params[f"gruB{layer}_sW"], params[f"gruB{layer}_sW2"], reverse=True)
        x = feedforward2_tanh(hf, hb, params[f"FF{layer}_Wf"],
                              params[f"FF{layer}_Wb"], params[f"FF{layer}_b"])
        x = checked(x, f"raw.ff2_{layer}", lo=-1.0, hi=1.0)
    post = softmax_with_temperature(x, params["FF3_W"], params["FF3_b"], tempW, tempb)
    post = checked(post, "raw.softmax", lo=0.0, hi=1.0)
    return robustlog(post, min_prob) if return_log else post


def _pad_rows(W, rows):
    return jnp.pad(W, ((0, rows - W.shape[0]), (0, 0)))


def _ff2_tanh_padded(hf, hb, Wf, Wb, b):
    """feedforward2_tanh on lane-padded hidden features, producing
    lane-padded output (pad columns are zero => tanh(0) = 0)."""
    Sp = hf.shape[-1]
    Wfp = jnp.pad(Wf, ((0, Sp - Wf.shape[0]), (0, Sp - Wf.shape[1])))
    Wbp = jnp.pad(Wb, ((0, Sp - Wb.shape[0]), (0, Sp - Wb.shape[1])))
    bp = jnp.pad(b, (0, Sp - b.shape[0]))
    return feedforward2_tanh(hf, hb, Wfp, Wbp, bp)


def raw_posterior_tm(params, sig, *, stride=4, min_prob=1e-5,
                     tempW=1.0, tempb=1.0, return_log=True):
    """Time-major Pallas variant of raw_posterior: [nblock, B, nstate]."""
    from scrappie_tpu.ops.gru import gru_layer_tm

    B = sig.shape[0]
    pad = (-B) % 8
    if pad:
        sig = jnp.pad(sig, ((0, pad), (0, 0), (0, 0)))
    x = jnp.tanh(conv1d(sig, params["conv_W"], params["conv_b"], int(stride)))
    x = jnp.moveaxis(x, 0, 1)
    for layer in (1, 2):
        hf = gru_layer_tm(x, params[f"gruF{layer}_iW"], params[f"gruF{layer}_b"],
                          params[f"gruF{layer}_sW"], params[f"gruF{layer}_sW2"])
        hb = gru_layer_tm(x, params[f"gruB{layer}_iW"], params[f"gruB{layer}_b"],
                          params[f"gruB{layer}_sW"], params[f"gruB{layer}_sW2"],
                          reverse=True)
        x = _ff2_tanh_padded(hf, hb, params[f"FF{layer}_Wf"],
                             params[f"FF{layer}_Wb"], params[f"FF{layer}_b"])
    post = softmax_with_temperature(x, _pad_rows(params["FF3_W"], x.shape[-1]),
                                    params["FF3_b"], tempW, tempb)
    if pad:
        post = post[:, :B]
    post = checked(post, "raw_tm.softmax", lo=0.0, hi=1.0)
    return robustlog(post, min_prob) if return_log else post


def events_posterior(params, feats, *, winlen=3, min_prob=1e-5,
                     tempW=1.0, tempb=1.0, return_log=True):
    """nanonet events net: window(3) -> 2x (biLSTM + FF2-tanh) -> softmax_temp
    (ref src/networks.c:146-194).  feats [B, nevent, 4].  Dispatches to
    the Pallas LSTM kernels on TPU."""
    from scrappie_tpu import ops

    if ops.pallas_enabled():
        lp = events_posterior_tm(params, feats, winlen=winlen,
                                 min_prob=min_prob, tempW=tempW, tempb=tempb,
                                 return_log=return_log)
        return jnp.moveaxis(lp, 0, 1)
    x = window(feats, winlen, 1)
    for layer in (1, 2):
        xf = feedforward(x, params[f"lstmF{layer}_iW"], params[f"lstmF{layer}_b"])
        xb = feedforward(x, params[f"lstmB{layer}_iW"], params[f"lstmB{layer}_b"])
        hf = lstm(xf, params[f"lstmF{layer}_sW"], params[f"lstmF{layer}_p"])
        hb = lstm(xb, params[f"lstmB{layer}_sW"], params[f"lstmB{layer}_p"], reverse=True)
        x = checked(
            feedforward2_tanh(hf, hb, params[f"FF{layer}_Wf"],
                              params[f"FF{layer}_Wb"], params[f"FF{layer}_b"]),
            f"events.ff2_{layer}", lo=-1.0, hi=1.0)
    post = softmax_with_temperature(x, params["FF3_W"], params["FF3_b"], tempW, tempb)
    post = checked(post, "events.softmax", lo=0.0, hi=1.0)
    return robustlog(post, min_prob) if return_log else post


def events_posterior_tm(params, feats, *, winlen=3, min_prob=1e-5,
                        tempW=1.0, tempb=1.0, return_log=True):
    """Time-major Pallas variant of events_posterior: [nevent, B, nstate]."""
    from scrappie_tpu.ops.lstm import lstm_layer_tm

    B = feats.shape[0]
    pad = (-B) % 8
    if pad:
        feats = jnp.pad(feats, ((0, pad), (0, 0), (0, 0)))
    x = jnp.moveaxis(window(feats, winlen, 1), 0, 1)  # [T, B, winlen*4]
    for layer in (1, 2):
        hf = lstm_layer_tm(x, params[f"lstmF{layer}_iW"], params[f"lstmF{layer}_b"],
                           params[f"lstmF{layer}_sW"], params[f"lstmF{layer}_p"])
        hb = lstm_layer_tm(x, params[f"lstmB{layer}_iW"], params[f"lstmB{layer}_b"],
                           params[f"lstmB{layer}_sW"], params[f"lstmB{layer}_p"],
                           reverse=True)
        x = _ff2_tanh_padded(hf, hb, params[f"FF{layer}_Wf"],
                             params[f"FF{layer}_Wb"], params[f"FF{layer}_b"])
    post = softmax_with_temperature(x, _pad_rows(params["FF3_W"], x.shape[-1]),
                                    params["FF3_b"], tempW, tempb)
    if pad:
        post = post[:, :B]
    post = checked(post, "events_tm.softmax", lo=0.0, hi=1.0)
    return robustlog(post, min_prob) if return_log else post


def squiggle_forward(params, seq, *, transform_units=True):
    """sequence -> predicted squiggle (ref src/networks.c:397-451).

    seq: int array [..., N] of bases; returns [..., N, 3] with columns
    (current, sd | log sd, dwell-samples | -log dwell) depending on
    transform_units.
    """
    x = embedding(seq, params["embed_W"])
    x = jnp.tanh(conv1d(x, params["conv1_W"], params["conv1_b"], int(params["conv1_stride"])))
    for k in range(2, 6):
        fx = jnp.tanh(
            conv1d(x, params[f"conv{k}_W"], params[f"conv{k}_b"], int(params[f"conv{k}_stride"]))
        )
        x = x + fx
    out = checked(
        conv1d(x, params["conv6_W"], params["conv6_b"],
               int(params["conv6_stride"])), "squiggle.conv6")
    if transform_units:
        current = out[..., 0:1]
        sd = jnp.exp(out[..., 1:2])
        dwell = jnp.exp(-out[..., 2:3])
        out = jnp.concatenate([current, sd, dwell], axis=-1)
    return out
