from .ckpt import nest_state_dict, load_torch_state_dict, to_jax_tree
