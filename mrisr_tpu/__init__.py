"""mrisr_tpu — TPU-native MRI diffusion super-resolution framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Bernat-C/MRI-Diffusion-SuperResolution (see SURVEY.md): DDPM/DDIM/SR3/Res-SRDiff
diffusion math, the two-stage ResDiff SR pipeline, SD1.5 latent SR with
LoRA/ControlNet/T2I-Adapter conditioning, medical-image data pipelines
(NIfTI/DICOM/BIDS), PSNR/SSIM/NMSE/HFEN evaluation, and v5e-mesh data
parallelism via `jax.sharding`.
"""

__version__ = "0.1.0"
