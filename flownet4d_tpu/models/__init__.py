from .sr4dflownet import SR4DFlowNet, SR4DFlowNetConfig, l2_regularization

__all__ = ["SR4DFlowNet", "SR4DFlowNetConfig", "l2_regularization"]
