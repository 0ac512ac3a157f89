"""scene subpackage."""
