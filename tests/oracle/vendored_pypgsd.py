# ============================================================================
# VENDORED ORACLE - NOT tpgsd CODE.  This file is a VERBATIM copy of the
# reference implementation's pure-Python reader
# (/root/reference/pgsd/pgsd/pypgsd.py, itself upstream GSD 3.2.0's
# pygsd.py, BSD 2-Clause, Copyright (c) 2016-2023 The Regents of the
# University of Michigan).  It is vendored UNCHANGED below this header as an
# independent bit-compatibility oracle: tests write files with tpgsd and
# require this reader - the spec reader the reference's own test suite
# relies on (reference: pgsd/pgsd/test/test_fl.py:6-7) - to parse them
# byte-for-byte identically to tpgsd's own readers.  Vendoring it verbatim
# is the point (like the golden tests/fixtures/*.gsd binaries): any
# deviation would weaken the oracle.  Do not edit; do not import outside
# tests.
# ============================================================================
# Copyright (c) 2016-2023 The Regents of the University of Michigan
# Part of GSD, released under the BSD 2-Clause License.

"""PGSD reader written in pure Python.

:file:`pypgsd.py` is a pure Python, read-only implementation of a PGSD file
reader. If your analysis tool is written in Python and you want to embed a PGSD
reader without requiring C code compilation or the **pgsd** compiled extension,
copy the following files from the :file:`pgsd/` directory:

* :file:`pgsd/`

    * :file:`__init__.py`
    * :file:`pypgsd.py`
    * :file:`hoomd.py`

The reader accepts any file-like Python object, which is useful for reading
from in-memory buffers. For regular filesystem access and for **writing** PGSD
files, use the compiled :py:mod:`pgsd.fl` module instead.

The :py:class:`PGSDFile` in this module is interchangeable with
:py:class:`pgsd.fl.PGSDFile` for read operations and works with
:py:class:`pgsd.hoomd.HOOMDTrajectory`:

>>> with pgsd.pypgsd.PGSDFile(open('simulation.gsd', 'rb')) as f:
...     t = pgsd.hoomd.HOOMDTrajectory(f)
...     pos = t[0].particles.position

"""

from __future__ import print_function
from __future__ import division
import logging
import numpy
import struct
from collections import namedtuple
import sys

version = "3.2.0"

logger = logging.getLogger('pgsd.pypgsd')

pgsd_header = namedtuple(
    'pgsd_header',
    'magic index_location index_allocated_entries '
    'namelist_location namelist_allocated_entries '
    'schema_version pgsd_version application '
    'schema reserved',
)
pgsd_header_struct = struct.Struct('QQQQQII64s64s80s')

pgsd_index_entry = namedtuple('pgsd_index_entry',
                             'frame N location M id type flags')
pgsd_index_entry_struct = struct.Struct('QQqIHBB')

pgsd_type_mapping = {
    1: numpy.dtype('uint8'),
    2: numpy.dtype('uint16'),
    3: numpy.dtype('uint32'),
    4: numpy.dtype('uint64'),
    5: numpy.dtype('int8'),
    6: numpy.dtype('int16'),
    7: numpy.dtype('int32'),
    8: numpy.dtype('int64'),
    9: numpy.dtype('float32'),
    10: numpy.dtype('float64'),
}


class PGSDFile(object):
    """PGSD file access interface.

    Implemented in pure Python and accepts any Python file-like object.

    Args:
        file: File-like object to read.

    PGSDFile implements an object oriented class interface to the PGSD file
    layer. Use it to open an existing file in a **read-only** mode. For
    read-write access to files, use the full featured C implementation in
    :py:mod:`pgsd.fl`. Otherwise, the two implementations can be used
    interchangeably.

    Examples:
        Open a file in **read-only** mode::

            f = PGSDFile(open('file.gsd', mode='r'))
            if f.chunk_exists(frame=0, name='chunk'):
                data = f.read_chunk(frame=0, name='chunk')

        Access file **metadata**::

            f = PGSDFile(open('file.gsd', mode='r'))
            print(f.name, f.mode, f.pgsd_version)
            print(f.application, f.schema, f.schema_version)
            print(f.nframes)

        Use as a **context manager**::

            with PGSDFile(open('file.gsd', mode='r')) as f:
                data = f.read_chunk(frame=0, name='chunk')
    """

    def __init__(self, file):
        self.__file = file

        logger.info('opening file: ' + str(file))

        # read the header
        self.__file.seek(0)
        try:
            header_raw = self.__file.read(pgsd_header_struct.size)
        except UnicodeDecodeError:
            print("\nDid you open the file in binary mode (rb)?\n",
                  file=sys.stderr)
            raise

        if len(header_raw) != pgsd_header_struct.size:
            raise IOError

        self.__header = pgsd_header._make(pgsd_header_struct.unpack(header_raw))

        # validate the header
        if self.__header.magic != 0x65DF65DF65DF65DF:
            raise RuntimeError("Not a PGSD file: " + str(self.__file))
        if (self.__header.pgsd_version < (1 << 16)
                and self.__header.pgsd_version != (0 << 16 | 3)):
            raise RuntimeError("Unsupported PGSD file version: "
                               + str(self.__file))
        if self.__header.pgsd_version >= (3 << 16):
            raise RuntimeError("Unsupported PGSD file version: "
                               + str(self.__file))

        # determine the file size (only works in Python 3)
        self.__file.seek(0, 2)

        # read the namelist block into a dict for easy lookup
        self.__namelist = {}
        c = 0
        self.__file.seek(self.__header.namelist_location, 0)
        namelist_raw = self.__file.read(self.__header.namelist_allocated_entries
                                        * 64)

        names = namelist_raw.split(b'\x00')

        for name in names:
            sname = name.decode('utf-8')
            if len(sname) != 0:
                logger.debug('Init PGSDFile: sname ' + sname)
                self.__namelist[sname] = c
                c = c + 1

        # read the index block. Since this is a read-only implementation, only
        # read in the used entries
        self.__index = []
        self.__file.seek(self.__header.index_location, 0)
        for i in range(self.__header.index_allocated_entries):
            index_entry_raw = self.__file.read(pgsd_index_entry_struct.size)
            if len(index_entry_raw) != pgsd_index_entry_struct.size:
                raise IOError

            idx = pgsd_index_entry._make(
                pgsd_index_entry_struct.unpack(index_entry_raw))

            # 0 location signifies end of index
            if idx.location == 0:
                break

            if not self.__is_entry_valid(idx):
                raise RuntimeError("Corrupt PGSD file: " + str(self.__file))

            if i > 0 and idx.frame < self.__index[i - 1].frame:
                raise RuntimeError("Corrupt PGSD file: " + str(self.__file))

            self.__index.append(idx)

        self.__is_open = True

    def __is_entry_valid(self, entry):
        """Return True if an entry is valid."""
        if entry.type not in pgsd_type_mapping:
            return False

        if entry.M == 0:
            return False

        if entry.frame >= self.__header.index_allocated_entries:
            return False

        if entry.id >= len(self.__namelist):
            return False

        if entry.flags != 0:
            return False

        return True

    def close(self):
        """Close the file.

        Once closed, any other operation on the file object will result in a
        `ValueError`. :py:meth:`close()` may be called more than once.
        The file is automatically closed when garbage collected or when
        the context manager exits.
        """
        if self.__is_open:
            logger.info('closing file: ' + str(self.__file))
            self.__handle = None
            self.__index = None
            self.__namelist = None
            self.__is_open = False
            self.__file.close()

    # def truncate(self):
    #     """Not implemented."""
    #     raise NotImplementedError

    def end_frame(self):
        """Not implemented."""
        raise NotImplementedError

    def write_chunk(self, name, data):
        """Not implemented."""
        raise NotImplementedError

    def _find_chunk(self, frame, name):
        # find the id for the given name
        if name in self.__namelist:
            match_id = self.__namelist[name]
        else:
            return None

        # TODO: optimize for v2.0 files
        # binary search for the first index entry at the requested frame
        L = 0
        R = len(self.__index)

        # progressively narrow the search window by halves
        while (R - L > 1):
            m = (L + R) // 2

            if frame < self.__index[m].frame:
                R = m
            else:
                L = m

        # this finds L = the rightmost index with the desired frame
        # search all index entries with the matching frame
        cur_index = L
        while cur_index >= 0 and self.__index[cur_index].frame == frame:
            if match_id == self.__index[cur_index].id:
                return self.__index[cur_index]
            cur_index = cur_index - 1

        # if we got here, we didn't find the specified chunk
        return None

    def chunk_exists(self, frame, name, write_all=False):
        """Test if a chunk exists.

        Args:
            frame (int): Index of the frame to check
            name (str): Name of the chunk

        Returns:
            bool: True if the chunk exists in the file. False if it does not.

        Example:

            Handle non-existent chunks::

                with PGSDFile(open('file.gsd', mode='r')) as f:
                    if f.chunk_exists(frame=0, name='chunk'):
                        return f.read_chunk(frame=0, name='chunk')
                    else:
                        return None
        """
        if not self.__is_open:
            raise ValueError("File is not open")

        chunk = self._find_chunk(frame, name)
        return chunk is not None

    def read_chunk(self, frame, name, offset=0, r_all=False):
        """Read a data chunk from the file and return it as a numpy array.

        Args:
            frame (int): Index of the frame to read
            name (str): Name of the chunk
            offset (int): Ignored in pure Python reader (always reads full chunk)
            r_all (bool): Ignored in pure Python reader (always reads full chunk)

        Returns:
            `numpy.ndarray`: Data read from file.

        Examples:
            Read a 1D array::

                with PGSDFile(open(filename, 'rb')) as f:
                    data = f.read_chunk(frame=0, name='chunk1d')
                    # data.shape == [N]

            Read a 2D array::

                with PGSDFile(open(filename, 'rb')) as f:
                    data = f.read_chunk(frame=0, name='chunk2d')
                    # data.shape == [N,M]

        .. tip::
            Each call invokes a disk read and allocation of a
            new numpy array for storage. To avoid overhead, don't call
            :py:meth:`read_chunk()` on the same chunk repeatedly. Cache the
            arrays instead.
        """
        if not self.__is_open:
            raise ValueError("File is not open")

        chunk = self._find_chunk(frame, name)

        if chunk is None:
            raise KeyError("frame " + str(frame) + " / chunk " + name
                           + " not found in: " + str(self.__file))

        logger.debug('read chunk: ' + str(self.__file) + ' - ' + str(frame)
                     + ' - ' + name)

        size = chunk.N * chunk.M * pgsd_type_mapping[chunk.type].itemsize
        if chunk.location == 0:
            raise RuntimeError("Corrupt chunk: " + str(frame) + " / " + name
                               + " in file" + str(self.__file))

        if size == 0:
            return numpy.array([], dtype=pgsd_type_mapping[chunk.type])

        self.__file.seek(chunk.location, 0)
        data_raw = self.__file.read(size)

        if len(data_raw) != size:
            raise IOError

        data_npy = numpy.frombuffer(data_raw,
                                    dtype=pgsd_type_mapping[chunk.type])

        if chunk.M == 1:
            return data_npy
        else:
            return data_npy.reshape([chunk.N, chunk.M])

    def find_matching_chunk_names(self, match, write_all=False):
        """Find chunk names in the file that start with the string *match*.

        Args:
            match (str): Start of the chunk name to match

        Returns:
            list[str]: Matching chunk names
        """
        result = []
        for key in self.__namelist.keys():
            if key.startswith(match):
                result.append(key)

        return result

    def __getstate__(self):
        """Implement the pickle protocol."""
        return dict(name=self.name)

    def __setstate__(self, state):
        """Implement the pickle protocol."""
        self.__init__(open(state['name'], 'rb'))

    def __enter__(self):
        """Implement the context manager protocol."""
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        """Implement the context manager protocol."""
        self.close()

    @property
    def name(self):
        """(str): file.name."""
        return self.__file.name

    @property
    def file(self):
        """File-like object opened."""
        return self.__file

    @property
    def mode(self):
        """str: Mode of the open file."""
        return 'r'

    @property
    def pgsd_version(self):
        """tuple[int, int]: PGSD file layer version number.

        The tuple is in the order (major, minor).
        """
        v = self.__header.pgsd_version
        return (v >> 16, v & 0xffff)

    @property
    def schema_version(self):
        """tuple[int, int]: Schema version number.

        The tuple is in the order (major, minor).
        """
        v = self.__header.schema_version
        return (v >> 16, v & 0xffff)

    @property
    def schema(self):
        """str: Name of the data schema."""
        return self.__header.schema.rstrip(b'\x00').decode('utf-8')

    @property
    def application(self):
        """str: Name of the generating application."""
        return self.__header.application.rstrip(b'\x00').decode('utf-8')

    @property
    def nframes(self):
        """int: Number of frames in the file."""
        if not self.__is_open:
            raise ValueError("File is not open")

        if len(self.__index) == 0:
            return 0
        else:
            return self.__index[-1].frame + 1
