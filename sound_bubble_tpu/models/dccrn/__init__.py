from sound_bubble_tpu.models.dccrn.model import Net  # noqa: F401
