"""Column-level expression builders (all Catalyst-native unless noted)."""
