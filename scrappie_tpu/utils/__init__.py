from scrappie_tpu.utils.maths import (  # noqa: F401
    logsumexp2,
    loglaplace,
    plogistic,
    madf,
    medianf,
    quantilef,
    medmad_normalise,
    studentise,
)
