from .io import save_checkpoint, load_checkpoint, save_params, load_params
from .torch_convert import convert_torch_state_dict, load_torch_checkpoint
