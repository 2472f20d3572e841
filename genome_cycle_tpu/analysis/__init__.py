"""Analysis & IO toolchain: Hi-C input prep, contact-map export, compartment
profiles, visualization dumps (reference layer: src/*.py + src/pkg/**)."""
