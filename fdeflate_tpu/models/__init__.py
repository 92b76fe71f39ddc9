"""Codec model families: decompressor, compressor levels, ultra-fast PNG mode."""
