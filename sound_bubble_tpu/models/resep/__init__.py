from sound_bubble_tpu.models.resep.model import Net  # noqa: F401
