"""Declarative model-zoo specifications.

Graph shapes per ref src/networks.c (see SURVEY.md Appendix A):
  raw_r94    conv+tanh -> (biGRU + FF-tanh) x2 -> softmax_temp
  rgrgr_*    conv(+elu/tanh) -> GRU B1,F2,B3,F4,B5 (FF-linear between)
             -> softmax_temp; 1025 states (4^5 kmers + stay)
  rnnrf_r94  conv+elu -> 5x residual(FF-linear + GRU, alternating dir)
             -> globalnorm CRF (25 transitions over -ACGT)
  events     window(3) over 4 event features -> 2x (biLSTM + FF2-tanh)
             -> softmax_temp
  squiggle_* embedding(4->3) -> conv+tanh -> 4x residual(conv+tanh)
             -> conv(3 outputs: current, log sd, -log dwell)

The raw-model weight headers are broken symlinks in the mounted reference
snapshot (SURVEY.md section 0), so their hidden sizes below are a
reconstruction; weights are synthesised deterministically until a real
re-export exists.  Strides/state counts follow the documented invariants
(rgrgr: stride 5, 1025 states — ref python/test/test_scrappy.py:47-48).
"""

from __future__ import annotations

import dataclasses

NBASE = 4
KMER_LEN = 5
NKMER = NBASE**KMER_LEN  # 1024
NSTATE_TRANSDUCER = NKMER + 1  # + stay
NSTATE_CRF = 5  # -ACGT
GRU_DIRS = ("b", "f", "b", "f", "b")  # rgrgr/rnnrf layer directions B1,F2,B3,F4,B5


@dataclasses.dataclass(frozen=True)
class RawModelSpec:
    name: str
    kind: str  # 'rgrgr' | 'raw' | 'rnnrf'
    stride: int
    conv_winlen: int
    conv_nfilter: int
    conv_activation: str  # 'elu' | 'tanh'
    size: int  # recurrent hidden size
    nstate: int
    synthetic: bool  # True when no real weights survive in the reference


@dataclasses.dataclass(frozen=True)
class SquiggleModelSpec:
    name: str
    header: str  # weight header filename under reference src/models/


@dataclasses.dataclass(frozen=True)
class EventsModelSpec:
    name: str = "nanonet_events"
    kind: str = "events"
    winlen: int = 3
    nfeature: int = 4
    size: int = 96
    nstate: int = NSTATE_TRANSDUCER
    stride: int = 1  # one block per event (chunk coordinates are events)
    synthetic: bool = True  # nanonet_events.h is absent from the reference


RAW_MODELS: dict[str, RawModelSpec] = {
    "raw_r94": RawModelSpec("raw_r94", "raw", 4, 11, 96, "tanh", 96, NSTATE_TRANSDUCER, True),
    "rgrgr_r94": RawModelSpec("rgrgr_r94", "rgrgr", 5, 19, 96, "elu", 96, NSTATE_TRANSDUCER, True),
    "rgrgr_r941": RawModelSpec("rgrgr_r941", "rgrgr", 5, 19, 96, "elu", 96, NSTATE_TRANSDUCER, True),
    "rgrgr_r10": RawModelSpec("rgrgr_r10", "rgrgr", 5, 19, 96, "tanh", 96, NSTATE_TRANSDUCER, True),
    "rnnrf_r94": RawModelSpec("rnnrf_r94", "rnnrf", 2, 19, 96, "elu", 96, NSTATE_CRF**2, True),
}

SQUIGGLE_MODELS: dict[str, SquiggleModelSpec] = {
    "squiggle_r94": SquiggleModelSpec("squiggle_r94", "squiggle_r94.h"),
    "squiggle_r94_rna": SquiggleModelSpec("squiggle_r94_rna", "squiggle_r94_rna.h"),
    "squiggle_r10": SquiggleModelSpec("squiggle_r10", "squiggle_r10.h"),
}

EVENTS_MODEL = EventsModelSpec()

# Header model-id token used in squiggle symbol names (misc/parse_squiggle.py)
SQUIGGLE_HEADER_IDS = {
    "squiggle_r94": "r94",
    "squiggle_r94_rna": "rna",
    "squiggle_r10": "r10",
}
