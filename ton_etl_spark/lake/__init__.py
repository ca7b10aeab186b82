from .table import LakeTable
from .merge import merge_into
from .consumer import ChangeFeedConsumer

__all__ = ["LakeTable", "merge_into", "ChangeFeedConsumer"]
