from . import attention, attention_processor, embeddings, modeling_utils  # noqa: F401
