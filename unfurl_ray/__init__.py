"""unfurl_ray — a Ray-Data-native rich-metadata extraction engine.

A from-scratch reimplementation of the observable behavior of the
``borderless/unfurl`` reference (see /root/repo/SURVEY.md), expressed as
``ray.data.Dataset`` pipelines: stateless ``map_batches`` over zero-copy
Arrow batches for parsing/extraction, actor pools for stateful stages
(JSON-LD context cache, compiled tables), and explicit
``(conv_id, turn_idx)`` ordering shuffles for transcript processing.

Nothing here is a port: all execution is Ray Data; only the *semantics*
(which fields are extracted, priority chains, value coercion quirks)
mirror the reference, with file:line citations in docstrings.
"""

__version__ = "0.1.0"
