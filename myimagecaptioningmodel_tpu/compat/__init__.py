"""Compatibility shims for the reference's on-disk artifacts.

``paddle_fmt``:    reader/writer for PaddlePaddle 1.x LoDTensor persistables
                   files (no paddle import needed).
``paddle_import``: name-map from the reference's ``ParamAttr`` variable
                   names (train.py:73 ``save_persistables`` output) onto this
                   framework's param/state pytrees.
"""
