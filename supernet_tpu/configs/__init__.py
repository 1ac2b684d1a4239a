"""Dataset/model/training configurations.

The reference's "config system" is editing kwargs with per-dataset divergent
defaults (`Hippocampus.py:425-428` vs `Brats.py:462-480`) plus hardcoded
paths. Here every dataset is a frozen dataclass; the CLI overrides fields.
"""

from supernet_tpu.configs.configs import (
    AugmentConfig,
    ModelConfig,
    TrainConfig,
    AttackConfig,
    NoiseConfig,
    ExperimentConfig,
    HIPPOCAMPUS,
    BRATS,
    LUNGS,
    get_config,
)

__all__ = [
    "AugmentConfig",
    "ModelConfig",
    "TrainConfig",
    "AttackConfig",
    "NoiseConfig",
    "ExperimentConfig",
    "HIPPOCAMPUS",
    "BRATS",
    "LUNGS",
    "get_config",
]
