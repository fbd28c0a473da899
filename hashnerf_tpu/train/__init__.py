from hashnerf_tpu.train.radam import radam
from hashnerf_tpu.train.losses import total_variation_loss, sigma_sparsity_loss
