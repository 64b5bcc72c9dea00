"""Data layer: host-side (numpy) event/video readers and training datasets.

The reference keeps this layer pure CPU (numpy/OpenCV/pandas) feeding device
tensors; we do the same, with a C++ fast path for event decoding (see
``v2e2v_tpu/runtime``) and device-prefetch helpers.
"""

from .event_readers import RefTimeEventReader, NpzEventReader, read_events_table
from .video_readers import (
    read_timestamps_file,
    PackReader,
    ImageReader,
    VideoReader,
)
