from .table import LakeTable
from .merge import merge_into

__all__ = ["LakeTable", "merge_into"]
