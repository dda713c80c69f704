"""Empirical simulator fitted to the bundled real reads.

train/simulate.py generates signal from the squiggle_r94 level model
with iid Laplace noise — but the bundled truth reads are older-chemistry
R9 data whose levels correlate with squiggle_r94 at only ~0.65, whose
noise is strongly AR(1)-autocorrelated (lag-1 ~0.83) and whose speeds
span 12-19 samples/base (measured in scripts/finetune_real.py work).
Training on that mismatch leaves a real-signal domain gap.

This module fits a generative model TO the labelled real reads
(train/realdata.py):
  * per-5mer level table, shrunk toward the 3-mer (centre trimer) table
    by observation count — the 3-mer table transfers across reads at
    r=0.96, the raw 5-mer estimates are noisy at ~14 obs each;
  * AR(1) noise (phi, sigma) fitted to the level residuals;
  * an empirical per-base dwell pool, resampled with a per-window rate
    factor so models learn speed invariance;
  * slow baseline drift + gain jitter, with medmad renormalisation —
    exactly what the real pipeline sees.

It also augments real windows (gain/offset/extra-noise/time-warp) so
fine-tuning on two reads does not collapse into memorisation.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from scrappie_tpu.models.specs import KMER_LEN, NSTATE_TRANSDUCER
from scrappie_tpu.train.realdata import (LabelledRead, _rolling_kmers,
                                         crf_labels, transducer_labels)


@dataclasses.dataclass
class EmpiricalModel:
    """Per-kmer levels + noise/dwell statistics fitted to labelled reads."""

    level: np.ndarray       # float32 [4**klen]
    level_sd: np.ndarray    # float32 [4**klen]
    phi: float              # AR(1) coefficient of the residual noise
    sigma: float            # stationary sd of the residual noise
    dwell_pool: np.ndarray  # int64, per-base dwell observations (samples)
    klen: int = KMER_LEN

    @classmethod
    def fit(cls, reads: list[LabelledRead], klen: int = KMER_LEN,
            min_count: int = 2, shrink: float = 8.0) -> "EmpiricalModel":
        nk = 4 ** klen
        sums = np.zeros(nk)
        sqs = np.zeros(nk)
        cnts = np.zeros(nk)
        tri_sums = np.zeros(64)
        tri_cnts = np.zeros(64)
        resid_pairs = []  # (r[t-1], r[t]) for AR(1) fit
        dwells = []
        for r in reads:
            kmers = _rolling_kmers(r.bases, klen)
            m = r.base_at >= klen - 1
            k_at = kmers[np.clip(r.base_at, 0, len(kmers) - 1)]
            obs = r.norm[m]
            k_m = k_at[m]
            sums += np.bincount(k_m, weights=obs, minlength=nk)
            sqs += np.bincount(k_m, weights=obs * obs, minlength=nk)
            cnts += np.bincount(k_m, minlength=nk)
            # centre trimer of the 5-mer (positions 1..3 of bases)
            tri = (k_m >> 2) & 0x3F
            tri_sums += np.bincount(tri, weights=obs, minlength=64)
            tri_cnts += np.bincount(tri, minlength=64)
            # dwell pool: run lengths of base_at over aligned samples
            ba = r.base_at[r.base_at >= 0]
            if len(ba):
                change = np.flatnonzero(np.diff(ba) != 0)
                dwells.append(np.diff(np.concatenate([[-1], change])))
        tri_mean = tri_sums / np.maximum(tri_cnts, 1)
        tri_of_k = (np.arange(nk) >> 2) & 0x3F
        k_mean = sums / np.maximum(cnts, 1)
        # shrink the 5-mer mean toward its centre-trimer mean
        w = cnts / (cnts + shrink)
        level = w * k_mean + (1 - w) * tri_mean[tri_of_k]
        level[cnts + tri_cnts[tri_of_k] == 0] = 0.0
        k_var = np.maximum(sqs / np.maximum(cnts, 1) - k_mean ** 2, 1e-4)
        sd_global = float(np.sqrt(np.median(k_var[cnts >= min_count])))
        level_sd = np.where(cnts >= min_count, np.sqrt(k_var), sd_global)

        # AR(1) noise from the MIDDLE samples of long dwells, residual to
        # the per-base mean: this excludes level-table error, alignment
        # error and base-boundary transition samples, which otherwise
        # inflate sigma ~1.6x (measured).
        ac_num = ac_den = 0.0
        for r in reads:
            ba = r.base_at
            change = np.flatnonzero(np.diff(ba) != 0) + 1
            bounds = np.concatenate([[0], change, [len(ba)]])
            for i in range(len(bounds) - 1):
                lo, hi = int(bounds[i]), int(bounds[i + 1])
                if ba[lo] < 0 or hi - lo < 7:
                    continue
                mid = r.norm[lo + 2 : hi - 2]
                resid = mid - mid.mean()
                resid_pairs.append(resid)
                ac_num += float((resid[:-1] * resid[1:]).sum())
                ac_den += float((resid * resid).sum())
        allr = (np.concatenate(resid_pairs) if resid_pairs
                else np.zeros(2, dtype=np.float64))
        phi = float(np.clip(ac_num / max(ac_den, 1e-9), 0.0, 0.98))
        sigma = float(allr.std())
        pool = (np.concatenate(dwells) if dwells
                else np.full(1000, 10, dtype=np.int64))
        return cls(level.astype(np.float32), level_sd.astype(np.float32),
                   phi, sigma, pool.astype(np.int64), klen)


class RealisticSimulator:
    """Signal/label batches from the fitted empirical model.

    Mirrors train/simulate.SquiggleSimulator's batch API so the trainer
    can mix the two sources.
    """

    def __init__(self, model: EmpiricalModel, seed: int = 0,
                 rate_range: tuple[float, float] = (0.7, 1.5),
                 drift_sd: float = 0.12, gain_jitter: float = 0.08,
                 occurrence_jitter: float = 0.28):
        self.m = model
        self.rng = np.random.default_rng(seed)
        self.rate_range = rate_range
        self.drift_sd = drift_sd
        self.gain_jitter = gain_jitter
        self.occurrence_jitter = occurrence_jitter

    def _synth(self, nsample: int):
        """One read window: (signal [nsample], base_at [nsample], bases)."""
        m, rng = self.m, self.rng
        rate = rng.uniform(*self.rate_range)
        n_bases = int(nsample / (np.mean(m.dwell_pool) * rate)) + m.klen + 24
        bases = rng.integers(0, 4, size=n_bases)
        kmers = _rolling_kmers(bases, m.klen)
        dwells = np.maximum(
            1, np.round(rng.choice(m.dwell_pool, size=n_bases) * rate)
        ).astype(np.int64)
        base_at = np.repeat(np.arange(n_bases), dwells)
        if len(base_at) < nsample:
            reps = -(-nsample // len(base_at))
            base_at = np.tile(base_at, reps)
        base_at = base_at[:nsample]
        # per-base level: kmer table + independent per-OCCURRENCE jitter
        # (pore-state variation between visits of the same kmer)
        base_lvl = (m.level[kmers]
                    + self.occurrence_jitter * rng.standard_normal(n_bases)
                    ).astype(np.float32)
        sig = base_lvl[base_at]
        # AR(1) noise at the fitted stationary sd: x[t] = sum_k phi^k e[t-k],
        # kernel truncated where phi^k < 1e-3 (exact to ~0.1%)
        innov_sd = m.sigma * np.sqrt(1.0 - m.phi ** 2)
        e = rng.standard_normal(nsample) * innov_sd
        ntap = max(1, int(np.ceil(np.log(1e-3) / np.log(max(m.phi, 1e-6)))))
        kernel = m.phi ** np.arange(ntap)
        noise = np.convolve(e, kernel)[:nsample]
        sig = sig + noise
        # slow baseline drift: smoothed random walk
        drift = np.cumsum(rng.standard_normal(nsample))
        drift *= self.drift_sd / max(np.abs(drift).max(), 1e-9)
        sig = sig + drift
        sig = sig * (1.0 + self.gain_jitter * rng.standard_normal())
        med = np.median(sig)
        mad = np.median(np.abs(sig - med)) * 1.4826
        sig = (sig - med) / max(mad, 1e-6)
        return sig.astype(np.float32), base_at, bases

    def labelled_batch(self, batch: int, nsample: int, stride: int,
                       klen: int = KMER_LEN):
        nblock = nsample // stride
        sigs = np.zeros((batch, nsample, 1), dtype=np.float32)
        labels = np.full((batch, nblock), -1, dtype=np.int32)
        for b in range(batch):
            sig, base_at, bases = self._synth(nsample)
            sigs[b, :, 0] = sig
            labels[b] = transducer_labels(base_at, bases, stride, klen)
        return sigs, labels

    def seq_batch(self, batch: int, nsample: int, L: int
                  ) -> tuple[np.ndarray, np.ndarray]:
        """(sigs [B,nsample,1], seqstates [B,L]) for the lattice loss."""
        from scrappie_tpu.train.realdata import window_seqstates

        sigs = np.zeros((batch, nsample, 1), dtype=np.float32)
        seqs = np.full((batch, L), -1, dtype=np.int32)
        for b in range(batch):
            sig, base_at, bases = self._synth(nsample)
            sigs[b, :, 0] = sig
            seqs[b] = window_seqstates(base_at, bases, L)
        return sigs, seqs

    def crf_labelled_batch(self, batch: int, nsample: int, stride: int):
        nblock = nsample // stride
        sigs = np.zeros((batch, nsample, 1), dtype=np.float32)
        labels = np.full((batch, nblock), -1, dtype=np.int32)
        for b in range(batch):
            sig, base_at, bases = self._synth(nsample)
            sigs[b, :, 0] = sig
            labels[b] = crf_labels(base_at, bases, stride)
        return sigs, labels


def augment_window(sig: np.ndarray, base_at: np.ndarray, rng,
                   warp_range=(0.85, 1.18), gain_sd=0.06, offset_sd=0.08,
                   noise_sd=0.12) -> tuple[np.ndarray, np.ndarray]:
    """Augment a real window: time-warp + gain/offset + extra noise.

    The warp resamples the signal by a random factor (linear interp) and
    maps the per-sample base index through the same coordinates, so the
    labels stay aligned.
    """
    n = len(sig)
    f = rng.uniform(*warp_range)
    src = np.arange(n) * f
    src = src[src <= n - 1]
    out = np.interp(src, np.arange(n), sig)
    ba = base_at[np.minimum(np.round(src).astype(np.int64), n - 1)]
    out = out * (1.0 + gain_sd * rng.standard_normal())
    out = out + offset_sd * rng.standard_normal()
    if noise_sd > 0:
        out = out + noise_sd * rng.standard_normal(len(out))
    return out.astype(np.float32), ba
