"""Model families: MobileNetV2 encoder; adaptive-attention LSTM decoder and
pre-LN transformer decoder (selected by ``model.decoder.arch``); captioner
facade dispatching both."""
