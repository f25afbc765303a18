"""Faithful re-implementation of diffusers' Attention + SDPA processor
semantics (torch 2.x default path)."""
import torch
import torch.nn as nn
import torch.nn.functional as F


class Attention(nn.Module):
    def __init__(self, query_dim, cross_attention_dim=None, heads=8,
                 dim_head=64, dropout=0.0, bias=False,
                 upcast_attention=False, upcast_softmax=False,
                 cross_attention_norm=None, added_kv_proj_dim=None,
                 norm_num_groups=None, out_bias=True, scale_qk=True,
                 only_cross_attention=False, processor=None, **kwargs):
        super().__init__()
        inner_dim = dim_head * heads
        self.heads = heads
        self.scale = dim_head ** -0.5 if scale_qk else 1.0
        self.upcast_attention = upcast_attention
        self.norm_cross = None
        kv_dim = cross_attention_dim if cross_attention_dim is not None \
            else query_dim
        self.to_q = nn.Linear(query_dim, inner_dim, bias=bias)
        self.to_k = nn.Linear(kv_dim, inner_dim, bias=bias)
        self.to_v = nn.Linear(kv_dim, inner_dim, bias=bias)
        self.to_out = nn.ModuleList([
            nn.Linear(inner_dim, query_dim, bias=out_bias),
            nn.Dropout(dropout),
        ])
        self.set_processor(processor if processor is not None
                           else AttnProcessor2_0())

    def set_processor(self, processor):
        self.processor = processor

    def prepare_attention_mask(self, attention_mask, target_length,
                               batch_size, out_dim=3):
        if attention_mask is None:
            return None
        if attention_mask.shape[-1] != target_length:
            pad = target_length - attention_mask.shape[-1]
            attention_mask = F.pad(attention_mask, (0, pad), value=0.0)
        return attention_mask.repeat_interleave(self.heads, dim=0)

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, **cross_attention_kwargs):
        return self.processor(self, hidden_states,
                              encoder_hidden_states=encoder_hidden_states,
                              attention_mask=attention_mask,
                              **cross_attention_kwargs)


class AttnProcessor2_0:
    def __call__(self, attn, hidden_states, encoder_hidden_states=None,
                 attention_mask=None, temb=None):
        batch_size, sequence_length, _ = (
            hidden_states.shape if encoder_hidden_states is None
            else encoder_hidden_states.shape)
        if attention_mask is not None:
            attention_mask = attn.prepare_attention_mask(
                attention_mask, sequence_length, batch_size)
            attention_mask = attention_mask.view(
                batch_size, attn.heads, -1, attention_mask.shape[-1])
        query = attn.to_q(hidden_states)
        if encoder_hidden_states is None:
            encoder_hidden_states = hidden_states
        key = attn.to_k(encoder_hidden_states)
        value = attn.to_v(encoder_hidden_states)
        inner_dim = key.shape[-1]
        head_dim = inner_dim // attn.heads
        query = query.view(batch_size, -1, attn.heads,
                           head_dim).transpose(1, 2)
        key = key.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        value = value.view(batch_size, -1, attn.heads,
                           head_dim).transpose(1, 2)
        hidden_states = F.scaled_dot_product_attention(
            query, key, value, attn_mask=attention_mask, dropout_p=0.0,
            is_causal=False)
        hidden_states = hidden_states.transpose(1, 2).reshape(
            batch_size, -1, attn.heads * head_dim)
        hidden_states = attn.to_out[0](hidden_states)
        hidden_states = attn.to_out[1](hidden_states)
        return hidden_states


AttnProcessor = AttnProcessor2_0
AttentionProcessor = AttnProcessor2_0
