"""Model family: MobileNetV2 encoder, adaptive-attention LSTM decoder, captioner facade."""
