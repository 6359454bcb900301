"""Real-data smoke run: the reference's bundled HG002/HG003/HG004 HiFi trio.

The bundled test_data (reference repo) lacks hg38.analysisSet.fa, so the
reference sequence over each catalog window is reconstructed from the reads
themselves by pileup majority vote (hom-alt sites bake the alt into the
estimate — fine for a smoke run; the point is exercising the full pipeline
on real 10-25kb HiFi reads: real base qualities, real error profile, real
HP phasing tags, the 7-column HipSTR BED, and the job.sh option set).

Usage: python benchmarks/real_data_smoke.py [n_loci] [--cpu]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))  # repo root: longtr_tpu without an editable install
