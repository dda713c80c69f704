from scrappie_tpu.io.crp import read_crp, write_crp  # noqa: F401
