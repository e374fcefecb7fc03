from . import fft, contrast, maps, gabor, minutiae, patches, pq, morphology, cylinder

__all__ = ["fft", "contrast", "maps", "gabor", "minutiae", "patches", "pq",
           "morphology", "cylinder"]
