"""Typed configuration, compatible with the reference's ``afis.config``.

The reference reads a flat JSON from the repo root with model / data / score
paths (/root/reference/afis.config:1-18, consumed at
extraction_latent.py:415-418 and matching/main.cpp:41-44). The same key
names are kept so an existing deployment's config file loads unchanged;
extra TPU-specific knobs get defaults when absent.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional


@dataclasses.dataclass
class AfisConfig:
    # model paths (checkpoint directories; orbax for the TPU stack)
    DimensionalityReductionModel: str = ""
    DescriptorModelPatch2: str = ""
    DescriptorModelPatch8: str = ""
    DescriptorModelPatch11: str = ""
    MinutiaeExtractionModel: str = ""
    MinutiaeExtractionModelLatentSTFT: str = ""
    # the rolled path's 64x64-patch variant (minutiae_AEC_modified)
    MinutiaeExtractionModelRolled: str = ""
    EnhancementModel: str = ""
    # data paths
    LatentImageDirectory: str = ""
    LatentTemplateDirectory: str = ""
    GalleryImageDirectory: str = ""
    GalleryTemplateDirectory: str = ""
    ScorePath: str = ""
    CodebookPath: str = ""
    MinuPath: Optional[str] = None
    # TPU-stack extensions
    MatchBlockSize: int = 64
    ComputeDtype: str = "float32"      # or "bfloat16"
    GalleryShards: int = 0             # 0 = all local devices

    @classmethod
    def load(cls, path: str) -> "AfisConfig":
        with open(path) as f:
            raw = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in known})

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)


def find_config(start: Optional[str] = None) -> Optional[str]:
    """Walk up from ``start`` looking for afis.config (reference behavior of
    resolving it relative to the repo root)."""
    d = os.path.abspath(start or os.getcwd())
    while True:
        cand = os.path.join(d, "afis.config")
        if os.path.exists(cand):
            return cand
        parent = os.path.dirname(d)
        if parent == d:
            return None
        d = parent
