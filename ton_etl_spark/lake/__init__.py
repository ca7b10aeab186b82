from .table import LakeTable
from .merge import merge_into
from .consumer import ChangeFeedConsumer
from .dedup_index import DedupIndex
from .neardup_index import NearDupIndex

__all__ = [
    "LakeTable",
    "merge_into",
    "ChangeFeedConsumer",
    "DedupIndex",
    "NearDupIndex",
]
