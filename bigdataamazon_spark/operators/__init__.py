"""Composable DataFrame -> DataFrame operators (the engine surface)."""
