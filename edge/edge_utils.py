"""Edge shim — fixture loading (see sound_bubble_tpu.runtime.export)."""
from sound_bubble_tpu.runtime.export import load_inputs  # noqa: F401
