"""Stage drivers: jit-compiled cell-cycle stage programs + structure transitions."""
