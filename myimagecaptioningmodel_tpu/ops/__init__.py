"""Core compute ops: functional layers, the fused LSTM cell, adaptive attention."""
