"""Label semantics of the real-read training samplers (train/realdata.py).

Uses synthetic LabelledReads (known base_at) so the label conventions
can be checked exactly without running a labelling model.
"""

import numpy as np
import pytest

from scrappie_tpu.models.specs import KMER_LEN, NSTATE_TRANSDUCER
from scrappie_tpu.train.realdata import (LabelledRead, RealEventSampler,
                                         RealReadSampler, _rolling_kmers,
                                         crf_labels, transducer_labels,
                                         window_seqstates)


def synth_read(seed=0, seqlen=400, dwell=12, name="synth"):
    rng = np.random.default_rng(seed)
    bases = rng.integers(0, 4, size=seqlen).astype(np.int64)
    levels = rng.normal(size=seqlen).astype(np.float32)
    dwells = np.maximum(rng.poisson(dwell, size=seqlen), 3)
    base_at = np.repeat(np.arange(seqlen), dwells)
    norm = levels[base_at] + 0.08 * rng.standard_normal(len(base_at)).astype(
        np.float32)
    return LabelledRead(name, norm.astype(np.float32), bases,
                        base_at.astype(np.int64), 0.5)


def test_transducer_labels_convention():
    r = synth_read()
    stride = 5
    lab = transducer_labels(r.base_at, r.bases, stride)
    kmers = _rolling_kmers(r.bases, KMER_LEN)
    last = r.base_at[stride - 1 :: stride][: len(lab)]
    for t in range(1, len(lab)):
        if lab[t] < 0:
            continue
        if last[t] == last[t - 1]:
            assert lab[t] == NSTATE_TRANSDUCER - 1  # stay
        else:
            assert lab[t] == kmers[last[t]]


def test_crf_labels_convention():
    r = synth_read(1)
    stride = 5
    lab = crf_labels(r.base_at, r.bases, stride)
    last = r.base_at[stride - 1 :: stride][: len(lab)]
    for t in range(1, len(lab)):
        if lab[t] < 0:
            assert last[t] - last[t - 1] > 1  # >1 new base: masked
        elif lab[t] == 4:
            assert last[t] == last[t - 1]
        else:
            assert lab[t] == r.bases[last[t]]


def test_window_seqstates_matches_kmers():
    r = synth_read(2)
    L = 64
    s0, n = 500, 600
    ss = window_seqstates(r.base_at[s0 : s0 + n], r.bases, L)
    valid = r.base_at[s0 : s0 + n]
    valid = valid[valid >= 0]
    lo = max(int(valid.min()), KMER_LEN - 1)
    hi = int(valid.max())
    kmers = _rolling_kmers(r.bases, KMER_LEN)
    want = kmers[lo : hi + 1][:L]
    assert (ss[: len(want)] == want).all()
    assert (ss[len(want) :] == -1).all()


@pytest.fixture(scope="module")
def ev_sampler():
    reads = [synth_read(3), synth_read(4, seqlen=300)]
    return RealEventSampler(reads, holdout_frac=0.25, seed=0)


def test_event_sampler_batch_shapes_and_masking(ev_sampler):
    feats, labels = ev_sampler.batch(4, 128)
    assert feats.shape == (4, 128, 4)
    assert labels.shape == (4, 128)
    assert np.isfinite(feats).all()
    # Whole-read studentisation: window means near zero, O(1) scale
    assert np.abs(feats.mean(axis=1)).max() < 1.0
    assert feats.std() < 4.0
    # Edge masking applied
    m = ev_sampler.edge_mask
    assert (labels[:, :m] == -1).all()
    assert (labels[:, -m:] == -1).all()
    # Labels are valid transducer states
    v = labels[labels >= 0]
    assert v.size and (v < NSTATE_TRANSDUCER).all()
    # Some stays and some kmer states should both appear
    assert (v == NSTATE_TRANSDUCER - 1).any()
    assert (v < NSTATE_TRANSDUCER - 1).any()


def test_event_sampler_holdout_excluded(ev_sampler):
    """Training windows only draw events from the head region."""
    for ridx, d in enumerate(ev_sampler._ev):
        n_train = ev_sampler._train_nev[ridx]
        assert n_train < len(d["ev_base"])  # a tail exists
    # eval tail has a nonempty truth
    feats, truth = ev_sampler.eval_events(0)
    assert len(truth) > 0
    assert feats.shape[1] == 4


def test_event_sampler_seq_batch(ev_sampler):
    feats, seqs = ev_sampler.seq_batch(4, 128, 160)
    assert feats.shape == (4, 128, 4)
    assert seqs.shape == (4, 160)
    for b in range(4):
        row = seqs[b]
        v = row[row >= 0]
        if not v.size:
            continue
        # contiguous prefix, -1 suffix
        assert (row[: len(v)] >= 0).all()
        assert (row[len(v) :] == -1).all()
        assert (v < NSTATE_TRANSDUCER - 1).all()  # kmer states, no stay


def test_event_sampler_short_training_region():
    """nevent larger than the training region: clamp, pad, no holdout
    leak (regression: broadcast crash / silent tail windows)."""
    reads = [synth_read(6, seqlen=120, dwell=10)]
    s = RealEventSampler(reads, holdout_frac=0.25, seed=0)
    n_train = s._train_nev[0]
    big = n_train + 500
    feats, labels = s.batch(3, big)
    assert feats.shape == (3, big, 4)
    # Padding region carries no labels and zero features
    assert (labels[:, n_train:] == -1).all()
    assert (feats[:, n_train:] == 0).all()
    feats, seqs = s.seq_batch(2, big, 64)
    assert feats.shape == (2, big, 4)


def test_events_lattice_train_step_runs(ev_sampler):
    """One lattice train step on real-detector event windows: finite
    loss, finite params (the real fine-tune path of finetune_real)."""
    import jax.numpy as jnp
    import optax

    from scrappie_tpu.models import registry
    from scrappie_tpu.train.lattice import make_lattice_train_step

    params = {k: jnp.asarray(v)
              for k, v in registry.load_params("nanonet_events").items()}
    opt = optax.apply_if_finite(optax.adam(1e-4), 5)
    step = make_lattice_train_step("nanonet_events", opt)
    state = opt.init(params)
    feats, seqs = ev_sampler.seq_batch(2, 96, 120)
    params, state, loss = step(params, state, jnp.asarray(feats),
                               jnp.asarray(seqs))
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(v)).all() for v in params.values())


def test_raw_sampler_augment_and_holdout():
    reads = [synth_read(5)]
    s = RealReadSampler(reads, holdout_frac=0.25, seed=0)
    sigs, labels = s.batch(4, 1000, 5, "transducer", augment=True)
    assert sigs.shape == (4, 1000, 1)
    assert labels.shape == (4, 200)
    sig, truth = s.eval_segment(0)
    assert len(truth) > 0
