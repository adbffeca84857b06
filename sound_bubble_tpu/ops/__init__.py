from sound_bubble_tpu.ops.stft import STFT, make_stft, mod_pad  # noqa: F401
