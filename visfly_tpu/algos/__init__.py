from .bptt import BPTT, BPTTState

__all__ = ["BPTT", "BPTTState"]
