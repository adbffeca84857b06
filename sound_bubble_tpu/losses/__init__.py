from sound_bubble_tpu.losses.sdr import SNRLosses, neg_sdr  # noqa: F401
from sound_bubble_tpu.losses.snrlp import SNRLPLoss  # noqa: F401
from sound_bubble_tpu.losses.basic import CompositeLoss, LogPowerLoss  # noqa: F401
from sound_bubble_tpu.losses.multires_stft import (  # noqa: F401
    MultiResoFuseLoss, MultiResolutionSTFTLoss,
)
from sound_bubble_tpu.losses.plcpa import PLCPALoss  # noqa: F401
