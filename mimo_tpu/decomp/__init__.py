"""Decomposition half: in-the-wild video → template (vid/mask/sdc/bk/occ).

TPU re-host of the reference's video_decomp stack (SURVEY.md §2b):
perception models run as batched JAX inference; host-side glue is numpy.
"""
