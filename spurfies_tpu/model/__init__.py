from spurfies_tpu.model.networks import init_model_params, mlp_apply
from spurfies_tpu.model.neural_points import SceneState, build_scene
from spurfies_tpu.model import field, sampler, renderer, losses
