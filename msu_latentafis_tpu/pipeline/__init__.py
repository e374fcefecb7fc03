from .latent import LatentFeatureExtractor
from .rolled import RolledFeatureExtractor
from .models_bundle import ModelBundle

__all__ = ["LatentFeatureExtractor", "RolledFeatureExtractor", "ModelBundle"]
