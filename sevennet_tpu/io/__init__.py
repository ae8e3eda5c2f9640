from .torch_checkpoint import load_sevennet_checkpoint, params_from_torch_state_dict

__all__ = ["load_sevennet_checkpoint", "params_from_torch_state_dict"]
