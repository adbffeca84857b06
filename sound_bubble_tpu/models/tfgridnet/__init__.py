from sound_bubble_tpu.models.tfgridnet.model import Net, NetConfig  # noqa: F401
