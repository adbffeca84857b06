from sound_bubble_tpu.models.waveformer.model import Net  # noqa: F401
