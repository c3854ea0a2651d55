from .layers import (
    GraphAttentionLayer,
    GATMultiHead,
    GraphAttentionLayer2D,
    GATMultiHead2D,
    normalized_adjacency,
)
from .baseline import BaselineModel, BaselineModel2D
from .gat3d import GAT3DHead, GATMultiHead3D, Model
from .wrappers import (
    SpatialModel,
    TemporalModel,
    TemporalModel4h,
    TemporalModel2l,
    MultiStreamModel,
    ConvGAT,
)

__all__ = [
    "GraphAttentionLayer",
    "GATMultiHead",
    "GraphAttentionLayer2D",
    "GATMultiHead2D",
    "normalized_adjacency",
    "BaselineModel",
    "BaselineModel2D",
    "GAT3DHead",
    "GATMultiHead3D",
    "Model",
    "SpatialModel",
    "TemporalModel",
    "TemporalModel4h",
    "TemporalModel2l",
    "MultiStreamModel",
    "ConvGAT",
]
