"""Training step for the raw basecall networks (framewise CE), sharded.

The reference framework is inference-only; training lived in ONT's
external Sloika.  Here training is first-class: a jittable, mesh-sharded
train step (data parallel over 'data', output projection tensor-sharded
over 'state') used both to validate multi-chip sharding
(__graft_entry__.dryrun_multichip) and to fit the raw models on
simulated squiggle data (scrappie_tpu.train.simulate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from scrappie_tpu.models import forward
from scrappie_tpu.models.specs import RAW_MODELS


def posterior_fn(model: str):
    if model == "nanonet_events":
        # A small floor keeps the CE loss finite: the peephole LSTM's
        # cell state is unbounded, and min_prob=0 lets one saturated
        # logit drive log(softmax) to -inf (observed divergence).
        return functools.partial(forward.events_posterior, min_prob=1e-6,
                                 return_log=True)
    spec = RAW_MODELS[model]
    if spec.kind == "rgrgr":
        return functools.partial(
            forward.rgrgr_posterior, conv_activation=spec.conv_activation,
            stride=spec.stride, min_prob=0.0, return_log=True,
        )
    if spec.kind == "raw":
        return functools.partial(forward.raw_posterior, stride=spec.stride,
                                 min_prob=0.0, return_log=True)
    if spec.kind == "rnnrf":
        return functools.partial(forward.rnnrf_transitions,
                                 conv_activation=spec.conv_activation,
                                 stride=spec.stride)
    raise ValueError(f"no trainer for model kind {spec.kind}")


def crf_loss_fn(params, sig, labels, model: str):
    """CRF negative log-likelihood on globally-normalised transitions.

    rnnrf_transitions already subtracts logZ/nblock per block
    (globalnorm, ref src/layers.c:874-889), so the per-path NLL is just
    the negative sum of the labelled transition energies
    trans[t, s_t*5 + s_{t-1}].  Masked blocks (-1) contribute nothing.
    """
    from scrappie_tpu import ops

    with ops.pallas(False):
        trans = posterior_fn(model)(params, sig)  # [B, nblock, 25]
    ns = 5
    nblock = min(trans.shape[1], labels.shape[1])
    trans = trans[:, :nblock]
    labels = labels[:, :nblock]
    prev = jnp.concatenate(
        [jnp.full((labels.shape[0], 1), 4, labels.dtype), labels[:, :-1]],
        axis=1)
    mask = (labels >= 0) & (prev >= 0)
    safe_l = jnp.where(mask, labels, 0)
    safe_p = jnp.where(mask, prev, 0)
    idx = safe_l * ns + safe_p
    energy = jnp.take_along_axis(trans, idx[..., None], axis=-1)[..., 0]
    return -(energy * mask).sum() / jnp.maximum(mask.sum(), 1)


def loss_fn(params, sig, labels, model: str):
    """Masked framewise cross-entropy on block kmer/stay labels."""
    from scrappie_tpu import ops

    # Training needs a VJP; the Pallas inference kernels define none, so
    # trace the lax.scan forward here (dispatch happens at trace time).
    with ops.pallas(False):
        lp = posterior_fn(model)(params, sig)  # [B, nblock, nstate] log probs
    nblock = min(lp.shape[1], labels.shape[1])
    lp = lp[:, :nblock]
    labels = labels[:, :nblock]
    mask = labels >= 0
    safe = jnp.where(mask, labels, 0)
    ce = -jnp.take_along_axis(lp, safe[..., None], axis=-1)[..., 0]
    return (ce * mask).sum() / jnp.maximum(mask.sum(), 1)


def make_train_step(model: str, optimizer):
    if model not in RAW_MODELS and model != "nanonet_events":
        raise ValueError(f"no trainer for model {model!r}")
    kind = RAW_MODELS[model].kind if model in RAW_MODELS else "events"
    lfn = crf_loss_fn if kind == "rnnrf" else loss_fn

    @jax.jit
    def train_step(params, opt_state, sig, labels):
        loss, grads = jax.value_and_grad(lfn)(params, sig, labels, model)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def train(model: str, steps: int = 200, batch: int = 8, nsample: int = 4000,
          lr: float = 2e-3, seed: int = 0, params=None, mesh=None,
          log_every: int = 25, simulator=None):
    """Fit a raw model on simulated squiggle reads.  Returns (params, losses)."""
    from scrappie_tpu.models import registry
    from scrappie_tpu.parallel.sharding import batch_sharding, shard_params
    from scrappie_tpu.train.simulate import SquiggleSimulator

    spec = RAW_MODELS.get(model)  # None for the events model
    if params is None:
        params = registry.load_params(model)
    params = {k: jnp.asarray(v) for k, v in params.items()}
    if mesh is not None:
        params = shard_params(params, mesh, state_shard_keys=("FF_W", "FF3_W"))
        bs = batch_sharding(mesh)
    else:
        bs = None

    optimizer = optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr)),
        max_consecutive_errors=25)
    opt_state = optimizer.init(params)
    step_fn = make_train_step(model, optimizer)
    sim = simulator if simulator is not None else SquiggleSimulator(seed=seed)

    losses = []
    if spec is None:  # nanonet_events: inputs are event features
        # Events come from the REAL t-stat detector on simulated signal
        # so the feature statistics match the events CLI pipeline.
        make_batch = lambda b, n, _s: sim.detected_events_batch(b, n // 10)
        stride = None
    else:
        make_batch = (sim.crf_labelled_batch if spec.kind == "rnnrf"
                      else sim.labelled_batch)
        stride = spec.stride
    for i in range(steps):
        sigs, labels = make_batch(batch, nsample, stride)
        if bs is not None:
            sigs = jax.device_put(sigs, bs)
            labels = jax.device_put(labels, bs)
        params, opt_state, loss = step_fn(params, opt_state, sigs, labels)
        losses.append(float(loss))
        if log_every and (i % log_every == 0 or i == steps - 1):
            print(f"[train {model}] step {i}: loss {float(loss):.4f}", flush=True)
    return {k: np.asarray(v) for k, v in params.items()}, losses
