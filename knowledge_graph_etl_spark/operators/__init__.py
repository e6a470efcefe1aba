from .bgp import BGP, BGPBuilder, Var, pattern, star_scan
from .construct import construct

__all__ = ["BGP", "BGPBuilder", "Var", "pattern", "star_scan", "construct"]
