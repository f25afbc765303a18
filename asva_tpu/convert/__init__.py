from .torch_to_jax import (convert_state_dict, unet_key_map, vae_key_map,  # noqa: F401
                           clip_text_key_map, imagebind_audio_key_map,
                           avsync_key_map, load_torch_state,
                           i3d_key_map, inception_v3_key_map,
                           imagebind_vision_key_map, imagebind_text_key_map)
