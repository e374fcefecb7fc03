from .mesh import make_mesh, gallery_sharding, replicated_sharding
from .sharding import shard_gallery, match_sharded, topk_collective

__all__ = ["make_mesh", "gallery_sharding", "replicated_sharding",
           "shard_gallery", "match_sharded", "topk_collective"]
