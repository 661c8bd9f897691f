from tpudf.ops.attention import attention, attention_reference

__all__ = ["attention", "attention_reference"]
