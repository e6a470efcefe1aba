from .bgp import BGP, BGPBuilder, Var, pattern
from .construct import construct

__all__ = ["BGP", "BGPBuilder", "Var", "pattern", "construct"]
