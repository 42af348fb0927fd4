from .porter import porter_stem, stem
