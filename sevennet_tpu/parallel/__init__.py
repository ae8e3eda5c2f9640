from .partition import DomainDecomposition, partition_system
from .model import distributed_compute, make_distributed_compute

__all__ = [
    "DomainDecomposition",
    "partition_system",
    "distributed_compute",
    "make_distributed_compute",
]
