from .vector import cosine_similarity, dot, l2_norm
from .hashing import md5_i64, md5_i32

__all__ = ["cosine_similarity", "dot", "l2_norm", "md5_i64", "md5_i32"]
