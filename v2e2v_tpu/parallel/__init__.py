"""Device mesh / sharding layer (the reference had none — single GPU only;
SURVEY.md §2 'parallelism strategies: none'). Scaling here is mesh-based:
data parallelism over independent sequences plus optional spatial sharding of
the image width for the fully-convolutional models, with XLA inserting all
collectives (gradient psum, conv halo exchanges) from sharding annotations."""

from .mesh import make_mesh, batch_sharding, replicated, make_e2v_train_step
