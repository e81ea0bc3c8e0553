"""Textured-mesh t-conorm parameter-p sweep
(reference: animations/panda_tcn_p.py).  Wrapper over panda_tcn.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if __name__ == '__main__':
    sys.argv = [sys.argv[0], '--sweep-p'] + sys.argv[1:]
    import runpy
    runpy.run_path(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                'panda_tcn.py'), run_name='__main__')
