from .beam import beam_decode
from .greedy import greedy_decode, init_cache

__all__ = ["beam_decode", "greedy_decode", "init_cache"]
