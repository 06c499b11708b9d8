from dgvcc_tpu.nn.layers import ConvBlock, upsample, instance_norm, dropout2d

__all__ = ["ConvBlock", "upsample", "instance_norm", "dropout2d"]
