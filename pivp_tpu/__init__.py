"""pivp_tpu — TPU-native physical-interaction video-prediction framework.

A from-scratch JAX/XLA/Pallas re-design with the capability surface of
kristofbc/physical-interaction-video-prediction (a Chainer port of Finn et
al., "Unsupervised Learning for Physical Interaction through Video
Prediction", NIPS 2016): action/state-conditioned ConvLSTM video predictors
with CDNA / DNA / STP transformation heads, scheduled sampling, the robot
push data pipeline, training / prediction / visualization entry points —
compiled as single-program XLA rollouts and sharded over TPU meshes.
"""

__version__ = "0.1.0"

from pivp_tpu.config import ModelConfig, TrainConfig  # noqa: F401
