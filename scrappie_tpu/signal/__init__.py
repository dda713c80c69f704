from scrappie_tpu.signal.trim import trim_raw_by_mad, trim_and_segment_raw  # noqa: F401
from scrappie_tpu.signal.events import detect_events, EventDetectionParams  # noqa: F401
