"""scrappie_tpu -- a TPU-native nanopore basecalling framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ONT's
`scrappie` technology demonstrator (reference: /root/reference).  The
compute path (signal features, conv + recurrent networks, Viterbi/CRF/DTW
decoding) runs on TPU via jit-compiled, batched, static-shape programs;
host-side work (fast5/FASTA IO, string assembly, homopolymer logic) runs
in numpy / native C++.

Public API intentionally mirrors the reference Python binding
(`python/scrappy/__init__.py`) so existing users can switch over:
    RawTable, calc_post, decode_post, basecall_raw, sequence_to_squiggle,
    map_signal_to_squiggle, map_post_to_sequence, get_model_stride.
"""

__version__ = "0.1.0"

_API_NAMES = (
    "RawTable",
    "basecall_raw",
    "calc_post",
    "decode_post",
    "get_model_stride",
    "guess_state_properties",
    "map_post_to_sequence",
    "map_signal_to_squiggle",
    "sequence_to_squiggle",
)


def __getattr__(name):
    # Lazy import: keeps `import scrappie_tpu` cheap and avoids pulling in
    # jax for host-only users of the signal/IO helpers.
    if name in _API_NAMES:
        import scrappie_tpu.api as _api

        return getattr(_api, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
