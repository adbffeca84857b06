from sound_bubble_tpu.models.dcc_tf.model import Net  # noqa: F401
