from diffulab_tpu.networks.denoisers.common import Denoiser

__all__ = ["Denoiser"]
