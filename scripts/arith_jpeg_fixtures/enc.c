/* Encode a PGM/PPM (P5/P6, 8-bit) from stdin to JPEG on stdout.
 * argv: quality arith(0|1) restart_interval
 * Ground-truth fixture generator against the system libjpeg62-turbo. */
#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>

static int rdint(FILE *f){int c,v=0;do{c=getc(f);if(c=='#'){while(c!='\n')c=getc(f);}}while(c==' '||c=='\n'||c=='\t'||c=='\r'||c=='#');
  while(c>='0'&&c<='9'){v=v*10+(c-'0');c=getc(f);}return v;}

int main(int argc, char **argv){
  int quality=atoi(argv[1]), arith=atoi(argv[2]), rst=atoi(argv[3]);
  int c1=getc(stdin), c2=getc(stdin);
  int ncomp=(c2=='6')?3:1; (void)c1;
  int w=rdint(stdin), h=rdint(stdin), maxv=rdint(stdin); (void)maxv;
  unsigned char *buf=malloc((size_t)w*h*ncomp);
  fread(buf,1,(size_t)w*h*ncomp,stdin);
  struct jpeg_compress_struct cinfo; struct jpeg_error_mgr jerr;
  cinfo.err=jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  unsigned char *out=NULL; unsigned long outlen=0;
  jpeg_mem_dest(&cinfo,&out,&outlen);
  cinfo.image_width=w; cinfo.image_height=h;
  cinfo.input_components=ncomp;
  cinfo.in_color_space=(ncomp==3)?JCS_RGB:JCS_GRAYSCALE;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo,quality,TRUE);
  cinfo.arith_code=arith?TRUE:FALSE;
  cinfo.restart_interval=rst;
  cinfo.optimize_coding=FALSE;
  jpeg_start_compress(&cinfo,TRUE);
  while(cinfo.next_scanline<cinfo.image_height){
    JSAMPROW row=buf+(size_t)cinfo.next_scanline*w*ncomp;
    jpeg_write_scanlines(&cinfo,&row,1);
  }
  jpeg_finish_compress(&cinfo);
  fwrite(out,1,outlen,stdout);
  jpeg_destroy_compress(&cinfo);
  return 0;
}
