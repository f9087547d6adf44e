"""Tracker suite as pure ``lax.scan`` step functions over fixed-capacity
slot state: OC-SORT, SORT, ByteTrack, StrongSORT, BoT-SORT, Deep-OC-SORT."""
