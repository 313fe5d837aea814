"""Hand-written TPU kernels (Pallas) for the hot ops.

The painter's scatter-add is the framework's hottest non-FFT operation
(SURVEY.md section 7 "hard parts"); paint_pallas implements it as a
sorted windowed deposit that never issues a hardware scatter.
"""
