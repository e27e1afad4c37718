from spurfies_tpu.core.embedder import positional_encoding, encoding_dim
from spurfies_tpu.core.density import laplace_density, get_beta
from spurfies_tpu.core.quadrature import render_weights
from spurfies_tpu.core import cameras
from spurfies_tpu.core.metrics import psnr
