"""Model zoo: UNet3D, VAE, CLIP text, ImageBind towers, AVSync classifier,
eval networks.  Import from submodules directly."""
