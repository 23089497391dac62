from bge_m3_onnx_spark.functions.tokenizer import tokenize_text, tokenize_udf

__all__ = ["tokenize_text", "tokenize_udf"]
