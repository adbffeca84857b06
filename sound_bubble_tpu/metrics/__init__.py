from sound_bubble_tpu.metrics.metrics import (  # noqa: F401
    Metrics, compute_decay, si_sdr, si_snr, snr,
)
