"""Edge shim — state flatten/unflatten (see sound_bubble_tpu.runtime.flatbuf)."""
from sound_bubble_tpu.runtime.flatbuf import (  # noqa: F401
    DELIMITER, flatten_state_buffers, unflatten_state_buffers,
)
