"""renderers subpackage."""
