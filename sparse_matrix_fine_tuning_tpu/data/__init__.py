from sparse_matrix_fine_tuning_tpu.data.tokenizer import SimpleTokenizer, get_tokenizer

__all__ = ["SimpleTokenizer", "get_tokenizer"]
