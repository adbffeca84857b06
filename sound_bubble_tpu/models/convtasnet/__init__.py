from sound_bubble_tpu.models.convtasnet.model import Net  # noqa: F401
