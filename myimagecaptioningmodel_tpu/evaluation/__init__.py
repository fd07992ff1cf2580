"""Evaluation: detokenization, BLEU metrics, offline test-set scoring."""
