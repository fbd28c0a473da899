from hashnerf_tpu.utils.metrics import img2mse, mse2psnr, to8b
