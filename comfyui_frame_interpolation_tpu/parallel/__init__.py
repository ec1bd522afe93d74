from .mesh import make_mesh
from .train import make_train_step, l1_loss
