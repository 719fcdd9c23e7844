from .scorer import batch_score, make_scorer
from .ann import MIPSIndex, mips_topk

__all__ = ["batch_score", "make_scorer", "MIPSIndex", "mips_topk"]
