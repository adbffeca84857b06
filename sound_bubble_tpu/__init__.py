"""sound_bubble_tpu — TPU-native (JAX/XLA/Pallas) Sound Bubble framework.

A from-scratch rebuild of the capabilities of chentuochao/Sound_Bubble
("Sound bubbles on hearables", Nature Electronics 2024): a 6-microphone,
24 kHz, streaming, causal, distance-conditioned speech separation system.
See SURVEY.md / DESIGN.md at the repo root.
"""

__version__ = "0.1.0"
